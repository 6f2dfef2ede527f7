"""Stage B — language-gated sentence segmentation.

Pure column expressions (no Python workers): split on sentence-final
punctuation per language, posexplode, tokenize, min-length filter and
CUTOFF truncation with the reference's semantics:

  * F1 min-length: drop sentences with <5 tokens (MOGANED data_load.py:24-25)
  * F2 truncation: tokens[:CUTOFF], CUTOFF=50 (JMEE consts.py:8,
    MOGANED consts.py:14)
  * language gate: lang in ('en','zh'); 'zh' tokenizes per character,
    'en' per whitespace word, lower-cased (SC7's lowercase step; WordPiece
    itself is out of scope for the constructed kernels)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUTOFF = 50  # JMEE consts.py:8 CUTOFF=50; MOGANED consts.py:14 MAXLEN=50
MIN_TOKENS = 5  # MOGANED data_load.py:24-25 skips len<5

_EN_BOUNDARY = r"(?<=[.!?])\s+"
_ZH_BOUNDARY = "[。！？]"


def sentences_stage(extracted: DataFrame) -> DataFrame:
    """extracted(url, warc_ts, lang, text) -> sentences table.

    Output: (url, warc_ts, lang, sent_id, sentence, tokens, n_tokens).
    Narrow except the initial explode; no shuffle.
    """
    gated = extracted.filter(F.col("lang").isin("en", "zh"))
    sents = gated.select(
        "url",
        "warc_ts",
        "lang",
        F.posexplode(
            F.when(
                F.col("lang") == "zh", F.split(F.col("text"), _ZH_BOUNDARY)
            ).otherwise(F.split(F.col("text"), _EN_BOUNDARY))
        ).alias("sent_id", "sentence"),
    ).filter(F.length(F.trim("sentence")) > 0)

    tokens = F.when(
        F.col("lang") == "zh",
        F.slice(
            F.filter(F.split(F.col("sentence"), ""), lambda c: c != " "),
            1,
            CUTOFF,
        ),
    ).otherwise(
        F.slice(
            F.filter(
                F.split(F.lower(F.regexp_replace("sentence", r"[^\w\s]", " ")), r"\s+"),
                lambda w: w != "",
            ),
            1,
            CUTOFF,
        )
    )
    out = sents.withColumn("tokens", tokens).withColumn(
        "n_tokens", F.size("tokens")
    )
    return out.filter(F.col("n_tokens") >= MIN_TOKENS)
