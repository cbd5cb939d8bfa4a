"""DSIR-style training-data selection (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling").

Scores every raw-corpus document by the log importance ratio
log p_target(x) - log p_raw(x) under hashed-n-gram bag models (the
paper's feature space: unigrams + bigrams hashed into B buckets,
add-alpha smoothed category distributions), then selects the top-k.

Scale shape: ONE extra pass over the corpus per distribution (two
groupBys on the hashed-bucket key — B rows out each, broadcast back),
one pass for scoring (explode → broadcast join on bucket → per-doc
sum).  The target sample is small by construction (it's the
high-quality seed set), the bucket tables are O(B) regardless of corpus
size, and every aggregation is map-side partial.  No Python in the hot
path: the feature hash is the engine-portable
``conv(substr(md5(gram),1,8),16,10) % B`` (same trick as simhash32).

Oracle: ``dsir_scores`` in __spark_entry__ replays the exact math in
DuckDB (same hash, same smoothing, same log-ratio sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(gram: Column, n_buckets: int) -> Column:
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10)
            .cast("long") % n_buckets).cast("int")


def hashed_ngram_features(docs: DataFrame, text_col: str = "text",
                          n_buckets: int = 1024) -> DataFrame:
    """(doc_id, bucket) — one row per unigram AND bigram occurrence
    (duplicates count: these are bag-of-features models)."""
    arr = F.split(F.col(text_col), " ")
    bigrams = F.when(
        F.size(arr) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(arr) - 1),
                    lambda i: F.concat(F.element_at(arr, i), F.lit(" "),
                                       F.element_at(arr, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return (docs.select("doc_id",
                        F.explode(F.concat(arr, bigrams)).alias("gram"))
            .select("doc_id", _bucket(F.col("gram"), n_buckets)
                    .alias("bucket")))


def bucket_log_probs(feats: DataFrame, n_buckets: int,
                     alpha: float = 1.0) -> DataFrame:
    """(bucket, logp) over ALL buckets 0..B-1: add-alpha smoothed log
    probabilities.  The corpus total enters via a 1-row cross join (no
    driver collect)."""
    spark = feats.sparkSession
    counts = feats.groupBy("bucket").agg(F.count("*").alias("cnt"))
    total = feats.agg(F.count("*").alias("total"))
    full = (spark.range(n_buckets).select(F.col("id").cast("int")
                                          .alias("bucket"))
            .join(counts, "bucket", "left")
            .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
            .crossJoin(F.broadcast(total)))
    return full.select(
        "bucket",
        F.log((F.col("cnt") + F.lit(float(alpha)))
              / (F.col("total") + F.lit(float(alpha * n_buckets))))
        .alias("logp"))


def dsir_scores(docs: DataFrame, target_docs: DataFrame,
                text_col: str = "text", n_buckets: int = 1024,
                alpha: float = 1.0, round_to: int = 6) -> DataFrame:
    """(doc_id, n_feats, dsir_score) for every raw doc: the summed
    log importance ratio of its hashed features.  Higher = more
    target-like."""
    raw_feats = hashed_ngram_features(docs, text_col, n_buckets)
    tgt_feats = hashed_ngram_features(target_docs, text_col, n_buckets)
    p_r = bucket_log_probs(raw_feats, n_buckets, alpha) \
        .withColumnRenamed("logp", "logp_raw")
    p_t = bucket_log_probs(tgt_feats, n_buckets, alpha) \
        .withColumnRenamed("logp", "logp_tgt")
    ratio = F.broadcast(p_t.join(p_r, "bucket"))
    return (raw_feats.join(ratio, "bucket")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_feats"),
                 F.round(F.sum(F.col("logp_tgt") - F.col("logp_raw")),
                         round_to).alias("dsir_score")))


def dsir_select(docs: DataFrame, target_docs: DataFrame, k: int,
                text_col: str = "text", n_buckets: int = 1024,
                alpha: float = 1.0, length_normalize: bool = False
                ) -> DataFrame:
    """Top-k most target-like docs (deterministic tie-break on doc_id).
    ``length_normalize`` scores per-feature instead of per-doc (long
    docs accumulate larger |log ratios|)."""
    s = dsir_scores(docs, target_docs, text_col, n_buckets, alpha)
    key = (F.col("dsir_score") / F.col("n_feats")) if length_normalize \
        else F.col("dsir_score")
    return (s.withColumn("_key", key)
            .orderBy(F.col("_key").desc(), "doc_id").limit(k)
            .drop("_key"))


def temperature_mix(docs: DataFrame, alpha: float = 0.5,
                    target_frac: float = 0.5,
                    source_col: str = "source") -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-sampling rule
    of Arivazhagan et al. 2019 §4 / mT5: sample domain s with
    probability ∝ p_s^alpha, p_s the domain's corpus share), realized
    as a deterministic per-row hash gate so the decision is stable
    under retries and resumable runs.

    Per-source sampling rate: r_s = min(1, target_frac * N * q_s / n_s)
    with q_s = p_s^alpha / Σ p^alpha — i.e. a corpus of ~target_frac*N
    docs whose domain mix follows the flattened distribution.  A row is
    kept when its uniform hash u(doc_id) < r_s.

    Scale shape: ONE map-side-combined groupBy(source) (the domain
    table is O(#domains) rows, broadcast back); the keep decision is a
    pure codegen projection.  Returns (doc_id, source, rate, kept).
    """
    n = docs.groupBy(source_col).agg(F.count("*").alias("ns"))
    tot = n.agg(F.sum("ns").alias("nt"))
    w = n.crossJoin(F.broadcast(tot)).select(
        source_col, "ns", "nt",
        F.pow(F.col("ns") / F.col("nt"), float(alpha)).alias("wgt"))
    z = w.agg(F.sum("wgt").alias("z"))
    rates = w.crossJoin(F.broadcast(z)).select(
        source_col,
        F.least(F.lit(1.0),
                F.lit(float(target_frac)) * F.col("nt")
                * (F.col("wgt") / F.col("z")) / F.col("ns"))
        .alias("rate"))
    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                 16, 10).cast("long") % 1_000_000) / F.lit(1_000_000.0))
    return (docs.join(F.broadcast(rates), source_col)
            .select("doc_id", source_col,
                    F.round(F.col("rate"), 6).alias("rate"),
                    (u < F.col("rate")).cast("int").alias("kept")))


def quality_classifier_train(docs: DataFrame, positive_docs: DataFrame,
                             text_col: str = "text",
                             n_buckets: int = 256, iters: int = 3,
                             lr: float = 0.5):
    """Classifier-based quality filtering, the GPT-3 / Llama-2 data
    selection method (Brown et al. 2020 appx A; palm/llama replicate
    it): train a logistic-regression quality classifier over hashed
    n-gram count features to separate a high-quality seed set
    (``positive_docs``, label 1) from the raw corpus (label 0), then
    score every document.

    Training is full-batch gradient descent with w0 = 0: each
    iteration is (1) score join (features × weights on the bucket
    key), (2) per-bucket gradient groupBy ``g_b = Σ_i cnt_ib (y_i -
    p_i)``, (3) ``w += lr · g / n`` — the weight table is O(n_buckets)
    rows, collected and re-broadcast per iteration (the standard
    full-batch LR shape on Spark; iterations are few and fixed).

    Returns (weights, feats, labels): weights as a {bucket: w} dict,
    plus the cached feature/label DataFrames for scoring.
    """
    import math

    pos_ids = positive_docs.select("doc_id").distinct()
    labels = (docs.select("doc_id").distinct()
              .join(pos_ids.withColumn("y", F.lit(1.0)), "doc_id", "left")
              .select("doc_id", F.coalesce("y", F.lit(0.0)).alias("y")))
    feats = (hashed_ngram_features(docs, text_col, n_buckets)
             .groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt")))
    feats = feats.join(labels, "doc_id").localCheckpoint()
    n = labels.count()
    w = {}
    for _ in range(iters):
        if w:
            wdf = F.broadcast(docs.sparkSession.createDataFrame(
                [(int(b), float(v)) for b, v in sorted(w.items())],
                "bucket int, w double"))
            logits = (feats.join(wdf, "bucket", "left")
                      .groupBy("doc_id", "y")
                      .agg(F.sum(F.col("cnt") * F.coalesce("w", F.lit(0.0)))
                           .alias("logit")))
        else:
            logits = feats.groupBy("doc_id", "y").agg(
                F.lit(0.0).alias("logit"))
        resid = logits.select(
            "doc_id",
            (F.col("y") - F.lit(1.0)
             / (F.lit(1.0) + F.exp(-F.col("logit")))).alias("r"))
        grad = (feats.join(resid, "doc_id")
                .groupBy("bucket")
                .agg(F.sum(F.col("cnt") * F.col("r")).alias("g")))
        for row in grad.collect():
            w[row["bucket"]] = w.get(row["bucket"], 0.0) \
                + lr * row["g"] / n
    return w, feats, labels


def quality_classifier_scores(docs: DataFrame, positive_docs: DataFrame,
                              text_col: str = "text",
                              n_buckets: int = 256, iters: int = 3,
                              lr: float = 0.5,
                              threshold: float = 0.0) -> DataFrame:
    """(doc_id, clf_score, clf_pass): final-weight logit per doc,
    rounded to 6 dp for engine/oracle agreement."""
    w, feats, _ = quality_classifier_train(
        docs, positive_docs, text_col, n_buckets, iters, lr)
    spark = docs.sparkSession
    wdf = F.broadcast(spark.createDataFrame(
        [(int(b), float(v)) for b, v in sorted(w.items())],
        "bucket int, w double"))
    return (feats.join(wdf, "bucket", "left")
            .groupBy("doc_id")
            .agg(F.round(F.sum(F.col("cnt") * F.coalesce("w", F.lit(0.0))),
                         6).alias("clf_score"))
            .withColumn("clf_pass",
                        (F.col("clf_score") > F.lit(threshold))
                        .cast("int")))
