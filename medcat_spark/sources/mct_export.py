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


def annotation_agreement(mct: DataFrame, project_a: str,
                         project_b: str) -> DataFrame:
    """Inter-annotator comparison of two projects over shared documents
    (reference utils/data_utils.py:126-222 are_anns_same/get_same_anns,
    used by consolidate_double_annotations): exact (doc_id, start, end)
    span join, then agreement status per annotation:

      agree     — both projects, same CUI
      conflict  — both projects, different CUI
      only_a / only_b — span annotated in one project only

    → (doc_id, start, end, cui_a, cui_b, status); aggregate with
    ``agreement_stats`` for the consolidated counts.
    """
    keys = ["doc_id", "start", "end"]
    a = (mct.where(F.col("project_id") == project_a)
         .select(*keys, F.col("cui").alias("cui_a")).distinct())
    b = (mct.where(F.col("project_id") == project_b)
         .select(*keys, F.col("cui").alias("cui_b")).distinct())
    j = a.join(b, keys, "full_outer")
    status = (F.when(F.col("cui_a").isNull(), "only_b")
              .when(F.col("cui_b").isNull(), "only_a")
              .when(F.col("cui_a") == F.col("cui_b"), "agree")
              .otherwise("conflict"))
    return j.select(*keys, "cui_a", "cui_b", status.alias("status"))


def agreement_stats(agreement: DataFrame) -> dict:
    """Consolidated counts + simple percent agreement
    (reference print_consolid_stats analogue)."""
    d = {r["status"]: r["n"] for r in
         agreement.groupBy("status").agg(F.count("*").alias("n")).collect()}
    agree = d.get("agree", 0)
    total = sum(d.values())
    return {**{k: d.get(k, 0) for k in
               ("agree", "conflict", "only_a", "only_b")},
            "total": total,
            "pct_agreement": round(agree / total, 4) if total else 0.0}
