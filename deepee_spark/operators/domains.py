"""Registrable-domain (eTLD+1) extraction and per-domain quotas.

Web-corpus curation groups and caps by REGISTRABLE domain, not host:
`a.example.co.uk` and `b.example.co.uk` are one publisher, and quota /
dedup / quality policies (RefinedWeb, FineWeb, CCNet — all public) key
on that unit. The grouping needs public-suffix-list semantics
(publicsuffix.org's documented algorithm): the public suffix of a host
is the LONGEST matching rule, where a rule is a plain suffix
(`co.uk`), a wildcard (`*.ck` — any single label + `ck`), or an
exception (`!www.ck` — overrides a wildcard; the public suffix is the
rule minus its leftmost label). The registrable domain is the public
suffix plus one more label.

Scale shape: the rule list is a few thousand rows — a broadcast
dimension. Matching is K fixed LEFT broadcast joins (one per candidate
suffix length, K = max rule depth), then an in-row greatest-length
resolution: NO shuffle is introduced at any corpus size, and the whole
thing stays inside whole-stage codegen between the joins. An
explode-based variant would shuffle the corpus on the candidate key;
this one never moves the fact table.

The rule table here is always caller-supplied (tests/oracles use a
deterministic synthetic list — no external data in the sandbox); on a
real cluster you'd load the published PSL snapshot as the dimension.

The reference has no URL machinery at all (file corpora); this is
engine infrastructure for the 10^12-doc crawl setting, next to
operators/urls.py (rule anchor: north rule's Common-Crawl-style pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deepest rule we match (labels). The real PSL's deepest rules are 5
# labels; candidates beyond MAX_RULE_LABELS can never match.
MAX_RULE_LABELS = 5


def apply_psl(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    max_labels: int = MAX_RULE_LABELS,
) -> DataFrame:
    """Adds `public_suffix` and `registrable_domain` to `df`.

    `rules` is a one-column DataFrame (rule: string) holding plain
    (`co.uk`), wildcard (`*.ck`) and exception (`!www.ck`) rules.

    Resolution, per publicsuffix.org's algorithm:
      1. an exception rule matching the host's tail wins outright: the
         public suffix is the rule minus its leftmost label;
      2. otherwise the longest matching plain-or-wildcard rule wins
         (a wildcard `*.x` matches any k+1-label tail whose last k
         labels are `x`);
      3. no rule matches -> prevailing rule is `*` (the PSL default):
         public suffix = the last label.
    The registrable domain is one label + the public suffix; a host
    that IS its own public suffix has registrable_domain NULL.
    """
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    out = df.withColumn("_labels", labels).withColumn("_n", n)

    # Fold the three rule forms into ONE dimension keyed by the rule's
    # bare suffix: a k-label key carries (plain match -> ps len k,
    # wildcard *.key -> ps len k+1, exception !key -> ps len k-1) side
    # by side, so matching needs a single broadcast LEFT join per
    # candidate length instead of three — a third the plan depth for
    # identical semantics.
    bare = (
        F.when(
            F.col("rule").startswith("!"), F.expr("substring(rule, 2)")
        )
        .when(
            F.col("rule").startswith("*."), F.expr("substring(rule, 3)")
        )
        .otherwise(F.col("rule"))
    )
    parsed = rules.select(
        bare.alias("key"),
        F.size(F.split(bare, r"\.")).alias("_nl"),
        F.col("rule").startswith("!").alias("_is_e"),
        F.col("rule").startswith("*.").alias("_is_w"),
    )
    dim = parsed.groupBy("key", "_nl").agg(
        F.max(
            F.when(~F.col("_is_e") & ~F.col("_is_w"), F.col("_nl"))
        ).alias("_p"),
        F.max(F.when(F.col("_is_w"), F.col("_nl") + 1)).alias("_w"),
        F.max(F.when(F.col("_is_e"), F.col("_nl") - 1)).alias("_e"),
    )
    for k in range(1, max_labels + 1):
        tail_k = F.when(
            F.col("_n") >= k,
            F.concat_ws(
                ".", F.slice("_labels", F.col("_n") - k + 1, k)
            ),
        )
        out = out.withColumn(f"_t{k}", tail_k)
        dim_k = dim.filter(F.col("_nl") == k).select(
            F.col("key").alias(f"_t{k}"),
            F.col("_p").alias(f"_p{k}"),
            F.col("_w").alias(f"_w{k}"),
            F.col("_e").alias(f"_e{k}"),
        )
        out = out.join(F.broadcast(dim_k), f"_t{k}", "left")
    # wildcard match of length k+1 also requires the host to HAVE a
    # (k+1)-th label
    wild_ok = [
        F.when(F.col("_n") >= k + 1, F.col(f"_w{k}"))
        for k in range(1, max_labels + 1)
    ]
    exc_len = F.coalesce(
        *[F.col(f"_e{k}") for k in range(max_labels, 0, -1)]
    )
    best_len = F.coalesce(
        exc_len,
        F.greatest(
            *(
                [F.col(f"_p{k}") for k in range(1, max_labels + 1)]
                + wild_ok
                + [F.lit(1)]  # PSL default rule '*': last label
            )
        ),
    )
    out = out.withColumn("_ps_len", best_len)
    ps = F.concat_ws(
        ".", F.slice("_labels", F.col("_n") - F.col("_ps_len") + 1, F.col("_ps_len"))
    )
    rd = F.when(
        F.col("_n") > F.col("_ps_len"),
        F.concat_ws(
            ".",
            F.slice(
                "_labels",
                F.col("_n") - F.col("_ps_len"),
                F.col("_ps_len") + 1,
            ),
        ),
    )
    drop = (
        ["_labels", "_n", "_ps_len"]
        + [f"_t{k}" for k in range(1, max_labels + 1)]
        + [f"_p{k}" for k in range(1, max_labels + 1)]
        + [f"_w{k}" for k in range(1, max_labels + 1)]
        + [f"_e{k}" for k in range(1, max_labels + 1)]
    )
    return (
        out.withColumn("public_suffix", ps)
        .withColumn("registrable_domain", rd)
        .drop(*drop)
    )


def domain_quota(
    df: DataFrame,
    quota: int,
    domain_col: str = "registrable_domain",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `quota` rows per registrable domain, best
    (score DESC, id ASC) first — the FineWeb-style per-publisher cap
    that stops one mega-site from dominating a training mix.

    The window is PARTITIONED by domain: per-key top-k parallelizes
    over the domain space (no global ordering anywhere), and a domain
    with pathological row counts costs only its own partition's sort.
    Rows with NULL domain (host == its public suffix) are kept: they
    are apex-suffix oddities a curation run wants surfaced, not
    silently dropped — and they BYPASS the window entirely, so the
    one partition a skewed corpus could actually blow up (every
    unmatched apex host shares the NULL key) is never sorted."""
    from pyspark.sql import Window as W

    w = W.partitionBy(domain_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    keyed = df.filter(F.col(domain_col).isNotNull())
    ranked = (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )
    return ranked.unionByName(df.filter(F.col(domain_col).isNull()))
