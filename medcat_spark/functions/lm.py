"""Corpus-level language-model filtering, decontamination, and sequence
packing — the CCNet/GPT-style pretraining-data stages.

Three operators, all expressed in built-in Spark SQL (zero Python in
the hot path), each with a row-for-row DuckDB oracle in
``__spark_entry__``:

* **Stupid-backoff n-gram LM perplexity filter** (Brants et al. 2007,
  "Large Language Models in Machine Translation" — the LM smoothing
  designed FOR distributed MapReduce training, which is why CCNet-class
  pipelines can train it at corpus scale): train unigram+bigram count
  tables with two map-side-combined groupBys, then score every document
  by its average log backoff score.  CCNet (Wenzek et al. 2020) keeps
  the low-perplexity head/middle of the corpus; ``lm_gate`` reproduces
  that as a literal threshold on the avg-logprob.

* **Benchmark decontamination** (GPT-3 appendix C / Llama 2 §A.6 style
  n-gram collision): a document is contaminated when any of its word
  n-grams appears in the benchmark set.  The benchmark side is tiny by
  construction (eval sets), so its distinct-gram table is broadcast —
  the corpus is scanned once, never shuffled.

* **Concat-and-chunk sequence packing** (GPT-style pretraining
  batching): lay all documents end-to-end in doc_id order and cut every
  ``ctx_len`` tokens; emit which chunk(s) each document lands in and
  with how many tokens.  The global running offset is a two-pass prefix
  sum — a window INSIDE fixed-width doc_id buckets plus a tiny
  bucket-offset table joined back — so no stage ever sees a
  single-partition global window.  At 10^12 docs the bucket table is
  ~n_docs/W rows (millions at W=1e6), still a broadcast.

Scale shape: LM training shuffles (gram, count) pairs with map-side
partial aggregation (the count tables are vocab-sized, orders of
magnitude below corpus size); scoring is explode → shuffle-join on the
gram key → one groupBy(doc_id).  Packing adds one window bounded by the
bucket width.  No collects except the bucket-offset/benchmark tables,
both O(small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shared n-gram helpers


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def _pos_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, w) — 0-based token positions."""
    return docs.select(
        "doc_id", F.posexplode(_words(text_col)).alias("pos", "w"))


def _word_ngrams(arr: Column, n: int) -> Column:
    return F.when(
        F.size(arr) >= n,
        F.transform(F.sequence(F.lit(1), F.size(arr) - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(arr, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# 1. stupid-backoff bigram LM


def lm_train(docs: DataFrame, text_col: str = "text"):
    """Train the count tables: returns (unigrams, bigrams, total).

    ``unigrams`` = (w, c1), ``bigrams`` = (w1, w2, c2), ``total`` a
    1-row (n_tokens) DataFrame.  Two groupBys, both map-side combined;
    output is vocab-sized, not corpus-sized.
    """
    toks = _pos_tokens(docs, text_col)
    uni = toks.groupBy("w").agg(F.count("*").alias("c1"))
    arr = _words(text_col)
    big = (docs.select(F.explode(_word_ngrams(arr, 2)).alias("g"))
           .select(F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
                   F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"))
           .groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    total = toks.agg(F.count("*").alias("n_tokens"))
    return uni, big, total


def lm_doc_scores(docs: DataFrame, lm=None, text_col: str = "text",
                  backoff: float = 0.4, oov_score: float = 1e-9) -> DataFrame:
    """(doc_id, n_scored, avg_logprob) under the stupid-backoff bigram
    LM.  Token 0 scores as its unigram MLE; token i>0 scores
    c2(w_{i-1} w_i)/c1(w_{i-1}) when the bigram was seen, else
    ``backoff`` * c1(w_i)/N (Brants et al. 2007 eq. 5, S-scores — not
    normalized probabilities, which is the published trade for
    distributed trainability).

    Words absent from the training vocabulary (only possible when
    ``lm`` was trained on a different corpus) score ``oov_score``.
    avg_logprob is rounded to 6 dp so engine/oracle ln() agree
    bit-for-bit after rounding.
    """
    uni, big, total = lm if lm is not None else lm_train(docs, text_col)
    # (w_prev, w) built as a pure projection from the token array — no
    # lag window, so the scoring pass carries NO shuffle before the
    # count-table joins (and stays legal on streaming DataFrames).
    arr = _words(text_col)
    pairs = (docs.select(
        "doc_id",
        F.explode(F.transform(
            arr,
            lambda w, i: F.struct(
                F.when(i > 0, F.element_at(arr, i)).alias("w_prev"),
                w.alias("w")))).alias("p"))
        .select("doc_id", "p.w_prev", "p.w"))
    scored = (
        pairs
        .join(uni.withColumnRenamed("w", "w").withColumnRenamed("c1", "c1_w"),
              on="w", how="left")
        .join(uni.select(F.col("w").alias("w_prev"),
                         F.col("c1").alias("c1_prev")),
              on="w_prev", how="left")
        .join(big.select(F.col("w1").alias("w_prev"),
                         F.col("w2").alias("w"), "c2"),
              on=["w_prev", "w"], how="left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.coalesce(
                F.when(F.col("w_prev").isNull(),
                       F.col("c1_w").cast("double") / F.col("n_tokens"))
                .when(F.col("c2").isNotNull(),
                      F.col("c2").cast("double") / F.col("c1_prev"))
                .otherwise(F.lit(backoff) * F.col("c1_w")
                           / F.col("n_tokens")),
                F.lit(float(oov_score))).alias("s"))
    )
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_scored"),
                 F.round(F.avg(F.log("s")), 6).alias("avg_logprob")))


def lm_gate(docs: DataFrame, threshold: float, lm=None,
            text_col: str = "text", backoff: float = 0.4) -> DataFrame:
    """CCNet-style keep/drop: keep documents whose avg_logprob is above
    ``threshold`` (low perplexity = in-domain fluent text)."""
    s = lm_doc_scores(docs, lm=lm, text_col=text_col, backoff=backoff)
    return s.withColumn(
        "lm_pass", (F.col("avg_logprob") > F.lit(threshold)).cast("int"))


# ---------------------------------------------------------------------------
# 2. benchmark decontamination


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits, contaminated) — n-gram collision against the
    benchmark table (any shared word n-gram ⇒ contaminated, the
    GPT-3/Llama-2 rule).  ``benchmark`` needs a ``text`` column; its
    distinct grams are broadcast (eval sets are small), so the corpus
    pass is shuffle-free up to the final doc_id agg.
    """
    bench_grams = (benchmark
                   .select(F.explode(_word_ngrams(_words(text_col), n))
                           .alias("g"))
                   .distinct())
    doc_grams = docs.select(
        "doc_id", F.explode(_word_ngrams(_words(text_col), n)).alias("g"))
    hits = (doc_grams.join(F.broadcast(bench_grams), "g", "inner")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    return (docs.select("doc_id").join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0).cast("int")
                    .alias("contaminated")))


# ---------------------------------------------------------------------------
# 3. concat-and-chunk sequence packing


def pack_sequences(docs: DataFrame, ctx_len: int, text_col: str = "text",
                   bucket_width: int = 1_000_000) -> DataFrame:
    """GPT-style packing: concatenate all documents in doc_id order and
    cut every ``ctx_len`` tokens.  Returns one row per (chunk, doc)
    intersection: (chunk_id, doc_id, tok_start, n_tokens) where
    tok_start is the document's offset within the chunk.

    The global prefix sum never builds a global window: token counts
    cumsum INSIDE fixed-width doc_id buckets (Window bounded by
    ``bucket_width`` rows), then a bucket-totals table (n_docs/W rows)
    gets its own cumsum and is broadcast back.  Deterministic — bucket
    boundaries are pure arithmetic on doc_id, not sampled ranges.
    """
    counted = docs.select(
        "doc_id",
        (F.floor(F.col("doc_id") / bucket_width)).alias("bkt"),
        F.size(_words(text_col)).alias("n_tok"))
    in_bkt = Window.partitionBy("bkt").orderBy("doc_id")
    local = counted.withColumn(
        "local_end", F.sum("n_tok").over(in_bkt))
    bkt_tot = (counted.groupBy("bkt").agg(F.sum("n_tok").alias("bkt_tok")))
    bkt_off = bkt_tot.withColumn(
        "bkt_off",
        F.coalesce(
            F.sum("bkt_tok").over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1)),
            F.lit(0))).select("bkt", "bkt_off")
    placed = (local.join(F.broadcast(bkt_off), "bkt")
              .select("doc_id", "n_tok",
                      (F.col("bkt_off") + F.col("local_end")
                       - F.col("n_tok")).alias("start")))
    end = F.col("start") + F.col("n_tok")
    first_chunk = F.floor(F.col("start") / ctx_len)
    last_chunk = F.floor((end - 1) / ctx_len)
    out = (placed.where(F.col("n_tok") > 0)
           .select("doc_id", "start", "n_tok",
                   F.explode(F.sequence(first_chunk, last_chunk))
                   .alias("chunk_id")))
    c0 = F.col("chunk_id") * ctx_len
    c1 = c0 + ctx_len
    seg_start = F.greatest(F.col("start"), c0)
    seg_end = F.least(F.col("start") + F.col("n_tok"), c1)
    return out.select(
        "chunk_id", "doc_id",
        (seg_start - c0).cast("long").alias("tok_start"),
        (seg_end - seg_start).cast("long").alias("n_tokens"))
