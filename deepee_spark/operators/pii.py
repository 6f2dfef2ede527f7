"""PII detection and redaction for web-crawl text.

A training-data pipeline over raw web text must strip personally
identifying strings before anything downstream sees them. This module
implements the three classic structured-PII detectors as pure JVM
regexp expressions (no UDF — the hot path stays inside whole-stage
codegen), with patterns deliberately restricted to RE2-compatible
syntax (no lookaround, no backreferences) so that any engine an oracle
runs in can replicate them:

  email: [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}
  ipv4:  \\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b
  phone: \\+\\d{1,2}[ -]\\d{3}[ -]\\d{4}   (international-prefix form)

Redaction replaces matches with typed placeholder tokens so downstream
token statistics stay meaningful. Order matters: emails first (their
domains may contain digit runs an IP pattern could claim), then IPs,
then phones; after each pass the placeholder contains no digits or
'@', so later passes cannot re-match inside an earlier redaction.

Production deployments would swap in richer pattern sets (names,
addresses need NER models); the operator shape — count + redact as one
projection, no shuffle — is the part that matters at crawl scale.

The reference corpus is file-based ACE text with no PII handling; this
is engine infrastructure for the web-crawl setting the north rule
targets, same category as operators/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[ -]\d{3}[ -]\d{4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact(text: Column) -> Column:
    """Replace every email, then IPv4, then phone match with its token."""
    c = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII counts (on the raw text) plus the redacted text.

    One narrow projection — counts and redaction share the scan, no
    shuffle, survives any scale the scan survives.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE)).cast("long")
    n_ipv4 = F.regexp_count(F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN),
                            F.lit(IPV4_RE)).cast("long")
    n_phones = F.regexp_count(t, F.lit(PHONE_RE)).cast("long")
    return df.withColumns(
        {
            "n_emails": n_emails,
            "n_ipv4": n_ipv4,
            "n_phones": n_phones,
            "pii_total": (n_emails + n_ipv4 + n_phones).cast("long"),
            "redacted": redact(t),
        }
    )
