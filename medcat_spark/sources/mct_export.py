"""S7: MedCATtrainer-export JSON source (supervised train/eval format).

Reference shape (cat.py:862-879, tests/resources/medcat_trainer_export.json):
{'projects': [{'name', 'id', 'cuis', 'documents': [{'id', 'name', 'text',
  'annotations': [{'start','end','cui','value','validated','killed',
  'deleted', ...}]}]}]}

Read with spark.read.json + nested explodes → flat gold-annotation rows
for the A4/J5 P/R harness (stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_mct_export(spark: SparkSession, path: str) -> DataFrame:
    """→ (project_id, project_name, project_cuis, doc_id, text,
         start, end, cui, value, validated, killed, deleted)"""
    raw = spark.read.option("multiLine", "true").json(path)
    proj = raw.select(F.explode("projects").alias("p"))
    doc = proj.select(
        F.col("p.id").cast("string").alias("project_id"),
        F.col("p.name").alias("project_name"),
        F.col("p.cuis").alias("project_cuis"),
        F.explode("p.documents").alias("d"))
    ann = doc.select(
        "project_id", "project_name", "project_cuis",
        F.col("d.id").cast("string").alias("doc_id"),
        F.col("d.text").alias("text"),
        F.explode("d.annotations").alias("a"))
    cols = ["start", "end", "cui", "value"]
    # Flag defaults follow the reference's stats.py: a MISSING 'validated'
    # means include (ann.get('validated', True)); killed/deleted default
    # False.  Nulls per-annotation coalesce the same way so partially
    # populated exports don't silently shrink the gold set.
    flag_defaults = {"validated": True, "killed": False, "deleted": False}
    have = set(ann.select("a.*").columns)
    sel = (["project_id", "project_name", "project_cuis", "doc_id", "text"]
           + [F.col(f"a.{c}").alias(c) for c in cols])
    for fl, dflt in flag_defaults.items():
        if fl in have:
            sel.append(F.coalesce(F.col(f"a.{fl}").cast("boolean"),
                                  F.lit(dflt)).alias(fl))
        else:
            sel.append(F.lit(dflt).alias(fl))
    return ann.select(*sel)


def gold_annotations(mct: DataFrame) -> DataFrame:
    """Usable gold rows: validated and not killed/deleted
    (stats.py:172-194 filtering in the reference)."""
    return (mct.where(F.col("validated") & ~F.col("killed") & ~F.col("deleted"))
            .select("doc_id", F.col("start").cast("int").alias("start"),
                    "cui"))


def documents_from_mct(mct: DataFrame) -> DataFrame:
    return mct.select("doc_id", "text").distinct()
