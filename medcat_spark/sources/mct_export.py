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


def consolidate_annotations(mct: DataFrame, require_double: bool = True,
                            require_double_inner: bool = True) -> DataFrame:
    """The reference's consolidate_double_annotations
    (utils/data_utils.py:413-501 + get_same_anns:152-222) as DataFrame
    joins: projects sharing a ``project_name`` under two different
    ``project_id``s are annotator pairs; the output is the flat
    agreed-annotation relation a supervised trainer consumes.

      * an annotator-1 VALIDATED annotation survives iff annotator 2
        has an annotation at the same (doc_id, start, end) with equal
        cui and flags (are_anns_same — every flag column present in the
        frame participates: validated/killed/deleted and, if carried,
        correct/alternative/manually_created);
      * ``require_double_inner=False`` additionally keeps one-sided
        validated annotations from EITHER annotator (the reference's
        reverse pass adds annotator-2-only spans);
      * ``require_double=False`` passes through projects that have no
        same-named partner, as-is.

    With >2 projects per name the reference pairs each project with the
    first other same-named project in file order; here the pair is the
    (min, next-min) project_id per name — deterministic under any
    partitioning.  Output columns = input columns, rows from the
    annotator-1 project (plus reverse-added annotator-2 rows)."""
    ids = mct.select("project_name", "project_id").distinct()
    a, b = ids.alias("pa"), ids.alias("pb")
    pairs = (a.join(b, (F.col("pa.project_name") == F.col("pb.project_name"))
                    & (F.col("pa.project_id") < F.col("pb.project_id")))
             .groupBy(F.col("pa.project_name").alias("project_name"))
             .agg(F.min(F.struct(F.col("pa.project_id").alias("id1"),
                                 F.col("pb.project_id").alias("id2")))
                  .alias("p"))
             .select("project_name", "p.id1", "p.id2"))

    keys = ["doc_id", "start", "end"]
    flag_cols = [c for c in ("cui", "validated", "killed", "deleted",
                             "correct", "alternative", "manually_created")
                 if c in mct.columns]
    ann1 = mct.join(pairs.select(F.col("id1").alias("project_id")),
                    "project_id")
    ann2 = mct.join(pairs.select(F.col("id2").alias("project_id")),
                    "project_id")
    # one row per annotator-2 span, deterministically (the reference's
    # get_ann_from_doc takes the first ann at a span; duplicate-span
    # exports are degenerate — the min flag-tuple is partition-stable)
    a2 = (ann2.groupBy(*keys)
          .agg(F.min(F.struct(*flag_cols)).alias("s"))
          .select(*keys, *[F.col(f"s.{c}").alias(f"b_{c}")
                           for c in flag_cols]))

    matched = ann1.where("validated").join(a2, keys, "left")
    same = F.lit(True)
    for c in flag_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"b_{c}"))
    agreed = matched.where(F.col("b_cui").isNotNull() & same) \
        .drop(*[f"b_{c}" for c in flag_cols])

    out = agreed
    if not require_double_inner:
        one_sided_1 = (matched.where(F.col("b_cui").isNull())
                       .drop(*[f"b_{c}" for c in flag_cols]))
        a1_spans = ann1.select(*keys).distinct()
        one_sided_2 = ann2.where("validated").join(a1_spans, keys,
                                                   "left_anti")
        out = out.unionByName(one_sided_1).unionByName(one_sided_2)
    if not require_double:
        paired = (pairs.select(F.col("id1").alias("project_id"))
                  .unionByName(pairs.select(F.col("id2")
                                            .alias("project_id"))))
        out = out.unionByName(mct.join(paired, "project_id", "left_anti"))
    return out


def project_cui_filters(mct: DataFrame) -> DataFrame:
    """(project_id, cui) allowed pairs from each project's ``cuis``
    filter string (reference utils/filters.py:33-58
    get_project_filters / stats.py project filtering).  Projects whose
    filter is empty contribute NO rows — meaning allow-all.  The
    reference's type_ids->cuis expansion requires the model's
    ``type_id2cuis`` map; pass those pairs pre-expanded into the MCT
    frame if needed (documented divergence: ``tuis`` strings are not
    read by this source)."""
    return (mct.select("project_id", "project_cuis").distinct()
            .select("project_id",
                    F.explode(F.split(F.coalesce(F.col("project_cuis"),
                                                 F.lit("")), ","))
                    .alias("cui"))
            .select("project_id", F.trim("cui").alias("cui"))
            .where(F.col("cui") != ""))


def filter_by_project(ann: DataFrame, filters: DataFrame) -> DataFrame:
    """Keep annotation rows whose cui is in their project's filter —
    rows of projects WITHOUT any filter rows pass untouched (the
    reference's check_filters: empty cuis set = allow all)."""
    has = (filters.select("project_id").distinct()
           .withColumn("has_filter", F.lit(True)))
    ok = filters.withColumn("ok", F.lit(True))
    return (ann.join(F.broadcast(has), "project_id", "left")
            .join(F.broadcast(ok), ["project_id", "cui"], "left")
            .where(F.col("has_filter").isNull() | F.col("ok").isNotNull())
            .drop("has_filter", "ok"))
