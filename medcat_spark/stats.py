"""A4/J5: P/R/F1 metrics — gold×pred joins on exact (doc_id, start, cui).

Reference: medcat/stats/stats.py:102-243 — TP on exact (start_char, cui)
match, FN = gold anti pred, FP = pred anti gold; per-CUI and overall
precision/recall/F1.  Pure DataFrame joins + aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEYS = ["doc_id", "start", "cui"]


def confusion(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Rows (doc_id, start, cui, kind) with kind ∈ {tp, fp, fn}."""
    p = pred.select(*_KEYS).distinct()
    g = gold.select(*_KEYS).distinct()
    tp = p.join(g, _KEYS, "inner").withColumn("kind", F.lit("tp"))
    fp = p.join(g, _KEYS, "left_anti").withColumn("kind", F.lit("fp"))
    fn = g.join(p, _KEYS, "left_anti").withColumn("kind", F.lit("fn"))
    return tp.unionByName(fp).unionByName(fn)


def per_cui_stats(pred: DataFrame, gold: DataFrame) -> DataFrame:
    c = confusion(pred, gold)
    agg = (c.groupBy("cui")
           .agg(F.sum(F.when(F.col("kind") == "tp", 1).otherwise(0)).alias("tp"),
                F.sum(F.when(F.col("kind") == "fp", 1).otherwise(0)).alias("fp"),
                F.sum(F.when(F.col("kind") == "fn", 1).otherwise(0)).alias("fn")))
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return agg.select("cui", "tp", "fp", "fn",
                      prec.alias("precision"), rec.alias("recall"),
                      f1.alias("f1"))


def overall_stats(pred: DataFrame, gold: DataFrame) -> dict:
    c = confusion(pred, gold).groupBy("kind").count().collect()
    d = {r["kind"]: r["count"] for r in c}
    tp, fp, fn = d.get("tp", 0), d.get("fp", 0), d.get("fn", 0)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": prec, "recall": rec, "f1": f1}
