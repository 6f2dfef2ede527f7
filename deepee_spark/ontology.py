"""Event / entity / role ontology.

The 33 ACE-2005 event types and the argument-role inventory follow the
public ACE-2005 annotation guidelines, the same fixed ontology the
reference hard-codes (MOGANED/consts.py:22-54 for trigger types,
consts.py:57-110 for entity types). We keep the label *strings* in the
reference's "Class:Subtype" style so eval tuples compare 1:1.

Also defines:
  * ``TRIGGER_LEXICON``: a deterministic trigger-word gazetteer
    (word -> event type), used both by the synthetic-corpus generator and
    to *construct* the DMCNN kernel's embedding table (kernels/weights.py)
    so the NumPy forward pass emits meaningful, reproducible predictions.
  * ``ROLE_RULE``: (event_type, entity_type) -> role, the deterministic
    argument-role assignment used by the generator and realized by the
    BiLSTM argument kernel's constructed output layer.
"""

from __future__ import annotations

# 33 ACE-2005 event types (Class:Subtype), per the public ACE guidelines;
# same inventory as MOGANED/consts.py:22-54.
EVENT_TYPES: list[str] = [
    "Business:Declare-Bankruptcy",
    "Business:End-Org",
    "Business:Merge-Org",
    "Business:Start-Org",
    "Conflict:Attack",
    "Conflict:Demonstrate",
    "Contact:Meet",
    "Contact:Phone-Write",
    "Justice:Acquit",
    "Justice:Appeal",
    "Justice:Arrest-Jail",
    "Justice:Charge-Indict",
    "Justice:Convict",
    "Justice:Execute",
    "Justice:Extradite",
    "Justice:Fine",
    "Justice:Pardon",
    "Justice:Release-Parole",
    "Justice:Sentence",
    "Justice:Sue",
    "Justice:Trial-Hearing",
    "Life:Be-Born",
    "Life:Die",
    "Life:Divorce",
    "Life:Injure",
    "Life:Marry",
    "Movement:Transport",
    "Personnel:Elect",
    "Personnel:End-Position",
    "Personnel:Nominate",
    "Personnel:Start-Position",
    "Transaction:Transfer-Money",
    "Transaction:Transfer-Ownership",
]

NEGATIVE_LABEL = "O"
# label id 0 = negative/other, 1..33 = EVENT_TYPES (reference convention:
# negative class occupies a reserved slot; DMCNN puts it last, MOGANED
# first — we standardize on 0=O and document the mapping).
EVENT_TYPE_TO_ID: dict[str, int] = {NEGATIVE_LABEL: 0}
EVENT_TYPE_TO_ID.update({t: i + 1 for i, t in enumerate(EVENT_TYPES)})
ID_TO_EVENT_TYPE: dict[int, str] = {v: k for k, v in EVENT_TYPE_TO_ID.items()}
NUM_EVENT_CLASSES = len(EVENT_TYPE_TO_ID)  # 34

# Coarse entity types (ACE has 7 coarse types; subtypes omitted — the
# reference's 54-entry list at MOGANED consts.py:57-110 is B-/I- expanded
# subtypes; our linking stage works at the coarse level).
ENTITY_TYPES: list[str] = ["PER", "ORG", "GPE", "LOC", "FAC", "VEH", "WEA", "TIME", "MONEY"]
ENTITY_TYPE_TO_ID = {t: i for i, t in enumerate(ENTITY_TYPES)}

# Argument roles (ACE role inventory subset covering every ROLE_RULE cell).
ROLES: list[str] = [
    "Agent", "Attacker", "Target", "Victim", "Person", "Entity", "Org",
    "Place", "Time", "Instrument", "Artifact", "Origin", "Destination",
    "Buyer", "Seller", "Money", "Giver", "Recipient", "Plaintiff",
    "Defendant", "Adjudicator", "Position",
]
NO_ROLE = "OTHER"  # JMEE ee.py:227-236 coalesces unmatched pairs to OTHER
ROLE_TO_ID: dict[str, int] = {NO_ROLE: 0}
ROLE_TO_ID.update({r: i + 1 for i, r in enumerate(ROLES)})
ID_TO_ROLE = {v: k for k, v in ROLE_TO_ID.items()}
NUM_ROLE_CLASSES = len(ROLE_TO_ID)  # 23

# Deterministic trigger gazetteer: one or two unambiguous trigger words per
# event type. English word forms; the generator embeds them verbatim.
TRIGGER_LEXICON: dict[str, str] = {
    "bankruptcy": "Business:Declare-Bankruptcy",
    "dissolved": "Business:End-Org",
    "merged": "Business:Merge-Org",
    "merge": "Business:Merge-Org",  # lemma; makes the driver's synthetic
    # web-text documents table (TESTDATA.md) yield non-empty extractions
    "founded": "Business:Start-Org",
    "attacked": "Conflict:Attack",
    "bombing": "Conflict:Attack",
    "protested": "Conflict:Demonstrate",
    "met": "Contact:Meet",
    "summit": "Contact:Meet",
    "telephoned": "Contact:Phone-Write",
    "acquitted": "Justice:Acquit",
    "appealed": "Justice:Appeal",
    "arrested": "Justice:Arrest-Jail",
    "indicted": "Justice:Charge-Indict",
    "convicted": "Justice:Convict",
    "executed": "Justice:Execute",
    "extradited": "Justice:Extradite",
    "fined": "Justice:Fine",
    "pardoned": "Justice:Pardon",
    "paroled": "Justice:Release-Parole",
    "sentenced": "Justice:Sentence",
    "sued": "Justice:Sue",
    "trial": "Justice:Trial-Hearing",
    "born": "Life:Be-Born",
    "died": "Life:Die",
    "killed": "Life:Die",
    "divorced": "Life:Divorce",
    "wounded": "Life:Injure",
    "married": "Life:Marry",
    "traveled": "Movement:Transport",
    "shipped": "Movement:Transport",
    "elected": "Personnel:Elect",
    "resigned": "Personnel:End-Position",
    "nominated": "Personnel:Nominate",
    "hired": "Personnel:Start-Position",
    "paid": "Transaction:Transfer-Money",
    "donated": "Transaction:Transfer-Money",
    "sold": "Transaction:Transfer-Ownership",
    "bought": "Transaction:Transfer-Ownership",
}

# (event class, entity type) -> role. Deterministic rule used by the
# synthetic generator's gold arguments and realized exactly by the
# constructed BiLSTM output layer. Fallback when a cell is absent: Entity.
ROLE_RULE: dict[tuple[str, str], str] = {}
for _ev in EVENT_TYPES:
    _cls = _ev.split(":")[0]
    ROLE_RULE[(_ev, "GPE")] = "Place"
    ROLE_RULE[(_ev, "LOC")] = "Place"
    ROLE_RULE[(_ev, "FAC")] = "Place"
    ROLE_RULE[(_ev, "TIME")] = "Time"
    ROLE_RULE[(_ev, "MONEY")] = "Money"
    if _cls == "Conflict":
        ROLE_RULE[(_ev, "PER")] = "Target"
        ROLE_RULE[(_ev, "ORG")] = "Attacker"
        ROLE_RULE[(_ev, "WEA")] = "Instrument"
        ROLE_RULE[(_ev, "VEH")] = "Target"
    elif _cls == "Life":
        ROLE_RULE[(_ev, "PER")] = "Victim"
        ROLE_RULE[(_ev, "ORG")] = "Agent"
        ROLE_RULE[(_ev, "WEA")] = "Instrument"
        ROLE_RULE[(_ev, "VEH")] = "Instrument"
    elif _cls == "Justice":
        ROLE_RULE[(_ev, "PER")] = "Defendant"
        ROLE_RULE[(_ev, "ORG")] = "Adjudicator"
        ROLE_RULE[(_ev, "WEA")] = "Instrument"
        ROLE_RULE[(_ev, "VEH")] = "Instrument"
    elif _cls == "Transaction":
        ROLE_RULE[(_ev, "PER")] = "Buyer"
        ROLE_RULE[(_ev, "ORG")] = "Seller"
        ROLE_RULE[(_ev, "WEA")] = "Artifact"
        ROLE_RULE[(_ev, "VEH")] = "Artifact"
    elif _cls == "Personnel":
        ROLE_RULE[(_ev, "PER")] = "Person"
        ROLE_RULE[(_ev, "ORG")] = "Entity"
        ROLE_RULE[(_ev, "WEA")] = "Entity"
        ROLE_RULE[(_ev, "VEH")] = "Entity"
    elif _cls == "Movement":
        ROLE_RULE[(_ev, "PER")] = "Agent"
        ROLE_RULE[(_ev, "ORG")] = "Agent"
        ROLE_RULE[(_ev, "WEA")] = "Artifact"
        ROLE_RULE[(_ev, "VEH")] = "Instrument"
    else:  # Business, Contact
        ROLE_RULE[(_ev, "PER")] = "Person"
        ROLE_RULE[(_ev, "ORG")] = "Org"
        ROLE_RULE[(_ev, "WEA")] = "Entity"
        ROLE_RULE[(_ev, "VEH")] = "Entity"


def role_for(event_type: str, entity_type: str) -> str:
    return ROLE_RULE.get((event_type, entity_type), "Entity")


# Entity gazetteer for the synthetic corpus + linking stage: surface form ->
# (entity_type, canonical id). Aliases share canonical ids (linking test).
# "united" prefix forms give the head-entity skew knob its hub.
ENTITY_GAZETTEER: dict[str, tuple[str, str]] = {
    "washington": ("GPE", "E:gpe.washington"),
    "beijing": ("GPE", "E:gpe.beijing"),
    "london": ("GPE", "E:gpe.london"),
    "paris": ("GPE", "E:gpe.paris"),
    "baghdad": ("GPE", "E:gpe.baghdad"),
    "america": ("GPE", "E:gpe.usa"),
    "usa": ("GPE", "E:gpe.usa"),
    "smith": ("PER", "E:per.smith"),
    "johnson": ("PER", "E:per.johnson"),
    "chen": ("PER", "E:per.chen"),
    "garcia": ("PER", "E:per.garcia"),
    "mueller": ("PER", "E:per.mueller"),
    "ivanov": ("PER", "E:per.ivanov"),
    "microsoft": ("ORG", "E:org.microsoft"),
    "toyota": ("ORG", "E:org.toyota"),
    "senate": ("ORG", "E:org.senate"),
    "pentagon": ("ORG", "E:org.pentagon"),
    "interpol": ("ORG", "E:org.interpol"),
    "airport": ("FAC", "E:fac.airport"),
    "hospital": ("FAC", "E:fac.hospital"),
    "courthouse": ("FAC", "E:fac.courthouse"),
    "tank": ("VEH", "E:veh.tank"),
    "convoy": ("VEH", "E:veh.convoy"),
    "missile": ("WEA", "E:wea.missile"),
    "rifle": ("WEA", "E:wea.rifle"),
    "tuesday": ("TIME", "E:time.tuesday"),
    "yesterday": ("TIME", "E:time.yesterday"),
}

# 45-tag POS set exists in the reference (consts.py:113-121); our pipeline
# does not need POS for the constructed kernels — kept out of scope.
