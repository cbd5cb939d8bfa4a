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


# ---------------------------------------------------------------------------
# k-fold supervised evaluation (reference medcat/stats/kfold.py:81-500):
# split the MCT export into k folds, per fold train from the BASE model on
# the other k-1 folds, evaluate on the held-out fold, aggregate.
# ---------------------------------------------------------------------------

# driver-side greedy split bound: ~100 bytes/row -> well under a GB
_WEIGHTED_SPLIT_MAX_DOCS = 5_000_000


def assign_folds_per_docs(doc_ids, k: int):
    """PerDocsFoldCreator (kfold.py:177-196): contiguous chunks of
    size n//k over the doc order; the LAST fold takes the remainder."""
    doc_ids = list(doc_ids)
    per = max(len(doc_ids) // k, 1)
    out = {}
    for fold in range(k):
        start = per * fold
        end = len(doc_ids) if fold == k - 1 else start + per
        for d in doc_ids[start:end]:
            out[d] = fold
    return out


def assign_folds_weighted(doc_weights, k: int):
    """WeightedDocumentsCreator (kfold.py:240-262): docs sorted by
    weight (#annotations) descending, each assigned greedily to the
    currently lightest fold."""
    folds = {}
    weights = [0] * k
    ordered = sorted(doc_weights, key=lambda dw: dw[1], reverse=True)
    for doc_id, w in ordered:
        i = min(range(k), key=lambda j: weights[j])
        folds[doc_id] = i
        weights[i] += w
    return folds


def kfold_stats(spark, mct: DataFrame, cdb, vocab, config, k: int = 3,
                split_type: str = "weighted") -> dict:
    """k-fold metrics over an MCT export DataFrame (sources/mct_export
    rows).  Per fold: deepcopy the base model, distributed-train on the
    other folds (model_ops.train_supervised_spark + apply_training),
    annotate the held-out docs, and accumulate exact (doc_id,start,cui)
    TP/FP/FN.  Returns overall and per-fold precision/recall/f1 —
    the reference averages per-fold metrics (kfold.py:457-500); the
    summed-confusion overall is also reported (micro average).
    """
    import copy

    from medcat_spark.model_ops import apply_training, train_supervised_spark
    from medcat_spark.pipeline import annotate, broadcast_model
    from medcat_spark.sources.mct_export import (documents_from_mct,
                                                 gold_annotations)

    docs = documents_from_mct(mct).cache()
    gold = (mct.where(F.col("validated") & ~F.col("killed")
                      & ~F.col("deleted"))
            .select("doc_id", F.col("start").cast("int").alias("start"),
                    F.col("end").cast("int").alias("end"), "cui").cache())

    ann_folds = None
    if split_type == "per_anns":
        # annotation-granularity folds (reference PerAnnsFoldCreator,
        # kfold.py:198-237): hash over the annotation identity, so one
        # doc can contribute training annotations to one fold and eval
        # annotations to another.  The reference quirk is kept: a
        # predicted train-fold annotation on an eval doc counts as FP
        # against that fold's gold, exactly as its per-fold exports do.
        fold_df = None
        ann_folds = gold.select(
            "doc_id", "start", "cui",
            F.pmod(F.xxhash64("doc_id",
                              F.col("start").cast("string"), "cui"),
                   F.lit(k)).cast("int").alias("fold"))
    elif split_type == "per_docs":
        # scale-safe fold assignment: a deterministic hash column instead
        # of collecting every doc_id to the driver.  Divergence from the
        # reference's PerDocsFoldCreator (contiguous chunks over input
        # order, kfold.py:177-196) is documented: hash folds are
        # order-free and partition-independent, which is what a
        # corpus-scale gold set needs; the contiguous splitter survives
        # as assign_folds_per_docs for parity tests.
        fold_df = docs.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(k)).cast("int").alias("fold"))
    elif split_type == "weighted":
        # the greedy balanced split is inherently sequential (reference
        # WeightedDocumentsCreator, kfold.py:240-262), so it stays
        # driver-side with an explicit size bound — its domain is MCT
        # exports (thousands of docs), not corpora.
        n_docs = docs.count()
        if n_docs > _WEIGHTED_SPLIT_MAX_DOCS:
            raise ValueError(
                f"split_type='weighted' collects one row per doc to the "
                f"driver and is bounded at {_WEIGHTED_SPLIT_MAX_DOCS} docs "
                f"(got {n_docs}); use split_type='per_docs' (hash folds) "
                f"for corpus-scale gold sets")
        w = (gold.groupBy("doc_id").agg(F.count("*").alias("w"))
             .join(docs.select("doc_id"), "doc_id", "right")
             .select("doc_id", F.coalesce("w", F.lit(0)).alias("w"))
             .orderBy("doc_id").collect())
        fold_of = assign_folds_weighted([(r["doc_id"], r["w"]) for r in w], k)
        fold_df = spark.createDataFrame(list(fold_of.items()),
                                        "doc_id string, fold int")
    else:
        raise ValueError(f"unknown split_type {split_type}")
    per_fold, tot = [], {"tp": 0, "fp": 0, "fn": 0}
    akeys = ["doc_id", "start", "cui"]
    for fold in range(k):
        if ann_folds is not None:
            train_gold = gold.join(
                ann_folds.where(F.col("fold") != fold).select(*akeys),
                akeys, "left_semi")
            eval_gold_f = gold.join(
                ann_folds.where(F.col("fold") == fold).select(*akeys),
                akeys, "left_semi")
            train_docs = docs.join(train_gold.select("doc_id"),
                                   "doc_id", "left_semi")
            eval_docs = docs.join(eval_gold_f.select("doc_id"),
                                  "doc_id", "left_semi")
            train_mct = mct.withColumn("start",
                                       F.col("start").cast("int")) \
                .join(train_gold.select(*akeys), akeys, "left_semi")
        else:
            train_docs = docs.join(fold_df.where(F.col("fold") != fold),
                                   "doc_id", "left_semi")
            eval_docs = docs.join(fold_df.where(F.col("fold") == fold),
                                  "doc_id", "left_semi")
            train_gold = gold.join(train_docs.select("doc_id"),
                                   "doc_id", "left_semi")
            eval_gold_f = None
            train_mct = mct.join(train_docs.select("doc_id"), "doc_id",
                                 "left_semi")
        model = copy.deepcopy(cdb)  # reference captured_state_cdb restore
        # train-fold gold names join the fold model's dictionary, like
        # the reference's per-annotation add_and_train_concept
        from medcat_spark.model_ops import add_gold_concepts
        add_gold_concepts(model, train_mct, config)
        bc = broadcast_model(spark, model, vocab, config)
        apply_training(model, train_supervised_spark(
            spark, train_gold, train_docs, bc, config).collect())
        bc2 = broadcast_model(spark, model, vocab, config)
        pred = annotate(eval_docs, bc2).select("doc_id", "start", "cui")
        eval_gold = (eval_gold_f if eval_gold_f is not None
                     else gold.join(eval_docs.select("doc_id"),
                                    "doc_id", "left_semi"))
        st = overall_stats(pred, eval_gold)
        per_fold.append(st)
        for kk in tot:
            tot[kk] += st[kk]
    docs.unpersist()
    gold.unpersist()

    prec = tot["tp"] / (tot["tp"] + tot["fp"]) if tot["tp"] + tot["fp"] else 0.0
    rec = tot["tp"] / (tot["tp"] + tot["fn"]) if tot["tp"] + tot["fn"] else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    n = len(per_fold)
    return {"folds": per_fold,
            "precision": prec, "recall": rec, "f1": f1, **tot,
            "precision_macro": sum(f["precision"] for f in per_fold) / n,
            "recall_macro": sum(f["recall"] for f in per_fold) / n}


def mc_train_test_split(ann: DataFrame, test_size: float = 0.2,
                        min_test_count: int = 10,
                        max_test_fraction: float = 0.3) -> DataFrame:
    """Deterministic scalable analogue of the reference's
    make_mc_train_test (utils/data_utils.py:817-955): split DOCUMENTS
    into train/test at annotation granularity targets.  Reference
    invariants preserved —

      * a document is test-ELIGIBLE iff at least one of its CUIs has a
        corpus count >= ``min_test_count`` AND adding the document keeps
        that CUI's test share under ``max_test_fraction``;
      * eligible documents enter the test set until the test set holds
        ~``test_size`` of all annotations; the rest train.

    The reference walks documents in a np.random permutation with
    running counters (inherently sequential); here the "permutation" is
    md5(doc_id) (engine-portable, so the DuckDB oracle reproduces it
    bit-for-bit) and the running counters are window cumulative sums
    over that order — same greedy, deterministic under any partitioning,
    and the per-CUI cumulative counts candidates in hash order rather
    than accepted-only (a conservative refinement that can only
    under-fill, never break the cap for the admitting CUI).  The
    windowed relation is one row per GOLD document (MCT-export scale),
    not the raw corpus.

    ``ann``: (doc_id, cui) rows, one per annotation.
    → (doc_id, split) with split in {'train', 'test'} for every doc.
    """
    from pyspark.sql.window import Window

    per = ann.groupBy("doc_id", "cui").agg(F.count("*").alias("v"))
    totals = per.groupBy("cui").agg(F.sum("v").alias("cnt"))
    total_anns = ann.count()
    per = (per.join(totals, "cui")
           .withColumn("rank", F.md5(F.col("doc_id").cast("string"))))

    w_cui = (Window.partitionBy("cui").orderBy("rank", "doc_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("v").over(w_cui), F.lit(0))
    elig = ((F.col("cnt") >= min_test_count)
            & ((cum_before + F.col("v")) / F.col("cnt") < max_test_fraction))
    docs = (per.withColumn("elig", elig)
            .groupBy("doc_id", "rank")
            .agg(F.max("elig").alias("candidate"),
                 F.sum("v").alias("doc_anns")))

    w_doc = (Window.orderBy("rank", "doc_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum_test = F.coalesce(
        F.sum(F.when(F.col("candidate"), F.col("doc_anns"))).over(w_doc),
        F.lit(0))
    split = (F.when(F.col("candidate")
                    & (cum_test < test_size * total_anns), "test")
             .otherwise("train"))
    return docs.select("doc_id", split.alias("split"))
