"""Evaluation aggregations (SURVEY.md §2.5 A3/A5, §2.4 J10).

Tuple-set P/R/F1 with the reference's conventions:
  * correct = |pred ∩ gold| via inner join on the full tuple key (J10,
    MOGANED utils.py:42-47 semantics)
  * P = correct/|pred|, R = correct/|gold|
  * division guards: MOGANED utils.py:50-53 returns P=1.0 when there are
    no predictions (vacuous precision); QAEE run_trigger_qa.py:263-266
    returns 0 — selectable per caller via ``empty_pred_precision``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tuple_set_prf(
    pred: DataFrame,
    gold: DataFrame,
    keys: list[str],
    empty_pred_precision: float = 1.0,
) -> dict[str, float]:
    """Set-semantics P/R/F1 of pred vs gold on the given tuple key."""
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    n_pred = p.count()
    n_gold = g.count()
    n_correct = p.join(g, keys, "left_semi").count()
    precision = (n_correct / n_pred) if n_pred else empty_pred_precision
    recall = (n_correct / n_gold) if n_gold else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {
        "n_pred": n_pred,
        "n_gold": n_gold,
        "n_correct": n_correct,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def prf_by_group(
    pred: DataFrame, gold: DataFrame, keys: list[str], group: str
) -> DataFrame:
    """Per-group P/R/F1 as a DataFrame (A3 as a relational aggregate)."""
    p = pred.select(group, *keys).distinct().withColumn("_p", F.lit(1))
    g = gold.select(group, *keys).distinct().withColumn("_g", F.lit(1))
    full = p.join(g, [group, *keys], "full_outer")
    return full.groupBy(group).agg(
        F.sum(F.coalesce("_p", F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce("_g", F.lit(0))).alias("n_gold"),
        F.sum(
            F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)
        ).alias("n_correct"),
    ).select(
        group,
        "n_pred",
        "n_gold",
        "n_correct",
        (F.col("n_correct") / F.col("n_pred")).alias("precision"),
        (F.col("n_correct") / F.col("n_gold")).alias("recall"),
    )
