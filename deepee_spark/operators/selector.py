"""M9 (AD-DMBERT adversarial selector) — the inference-side math.

The reference's GAN trains a selector whose per-example scores are
sharpened and normalized over the example set:

    w_i = softmax_i(s_i ** alpha)          (train.py:134-136 genLoss,
                                            169-171 disUnconfLoss)

and those weights drive -dot(w, log(dScores)) losses. The TRAINING of
selector/discriminator is out of scope (SURVEY §7 non-goals, no GPU);
the data-side operations that surround it are all engine ops and are
implemented: per-round correct-count accumulation (utimes, A9 ->
StageCatalog.merge_accumulate), threshold promotion to the confident
set (dataset.py:121-126 dump -> U2 confidence transfer), and — here —
the sharpened global-softmax weighting itself, which at corpus scale
is a two-aggregate pattern, not a window:

  1. one broadcast single-row aggregate for the stable max shift,
  2. exp/normalize against a second broadcast sum.

No collect, no global sort, no window over all rows; both aggregates
partial-agg map-side, so the weighting scales like a count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def selector_weights(df: DataFrame, score_col: str = "score",
                     alpha: float = 2.0) -> DataFrame:
    """Adds ``weight`` = softmax over ALL rows of score**alpha
    (max-shifted for stability), rounded to 9dp."""
    t = F.pow(F.col(score_col), F.lit(float(alpha)))
    with_t = df.withColumn("_t", t)
    mx = F.broadcast(with_t.agg(F.max("_t").alias("_mx")))
    shifted = with_t.crossJoin(mx).withColumn(
        "_e", F.exp(F.col("_t") - F.col("_mx"))
    )
    z = F.broadcast(shifted.agg(F.sum("_e").alias("_z")))
    return (
        shifted.crossJoin(z)
        .withColumn("weight", F.round(F.col("_e") / F.col("_z"), 9))
        .drop("_t", "_mx", "_e", "_z")
    )
