"""The corpus-cleaning gates on STREAMING input: the quality/Gopher/C4
projections are stateless codegen, so they run unchanged on readStream;
LM scoring joins a stream against the static count tables (its pair
builder is a projection, not a window, since the lag-window removal)."""

from pyspark.sql import functions as F


def _stream(spark, tmp_path, rows, schema, name):
    src = str(tmp_path / name)
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    return spark.readStream.schema(schema).parquet(src)


def _collect(spark, df, qname):
    q = (df.writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {qname}").collect()


ROWS = [(0, "first proper line goes here.\nsecond proper line is here."),
        (1, "short\nno punct line"),
        (2, "third proper line ends now.\nfourth proper line ends too.")]
SCHEMA = "doc_id long, text string"


def test_c4_and_gopher_gates_stream(spark, tmp_path):
    from medcat_spark.functions.gopher import gopher_gate
    from medcat_spark.functions.text import c4_clean
    stream = _stream(spark, tmp_path, ROWS, SCHEMA, "docs")
    got = {r["doc_id"]: r for r in
           _collect(spark, c4_clean(stream), "c4_stream")}
    batch = {r["doc_id"]: r for r in
             c4_clean(spark.createDataFrame(ROWS, SCHEMA)).collect()}
    assert got.keys() == batch.keys()
    for k in batch:
        assert got[k]["c4_text"] == batch[k]["c4_text"]
        assert got[k]["c4_pass"] == batch[k]["c4_pass"]
    # gopher_gate's n-gram families aggregate per doc_id, which a
    # stateless append stream cannot express — the streaming recipe is
    # foreachBatch (each micro-batch is a bounded DataFrame):
    got_g = {}

    def apply_gate(batch_df, _epoch):
        for r in gopher_gate(batch_df, min_words=3).collect():
            got_g[r["doc_id"]] = r["gopher_pass"]

    q = (stream.writeStream.foreachBatch(apply_gate)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    gb = gopher_gate(spark.createDataFrame(ROWS, SCHEMA),
                     min_words=3).collect()
    assert got_g == {r["doc_id"]: r["gopher_pass"] for r in gb}


def test_lm_scores_stream_static_join(spark, tmp_path):
    """Score STREAMING docs under an LM trained on a static corpus —
    the daily-increment shape: count tables are static DataFrames, the
    stream side never shuffles before the joins."""
    from medcat_spark.functions import lm
    static = spark.createDataFrame(ROWS, SCHEMA)
    model = lm.lm_train(static)
    stream = _stream(spark, tmp_path, ROWS, SCHEMA, "docs_lm")
    # groupBy(doc_id) on a stream needs update/complete mode; score at
    # the pair level here and aggregate in the memory table instead
    uni, big, total = model
    n_tokens = total.first()["n_tokens"]
    arr = F.split(F.col("text"), " ")
    pairs = (stream.select(
        "doc_id",
        F.explode(F.transform(
            arr, lambda w, i: F.struct(
                F.when(i > 0, F.element_at(arr, i)).alias("w_prev"),
                w.alias("w")))).alias("p"))
        .select("doc_id", "p.w_prev", "p.w"))
    scored = (pairs
              .join(uni.select("w", F.col("c1").alias("c1_w")), "w", "left")
              .join(uni.select(F.col("w").alias("w_prev"),
                               F.col("c1").alias("c1_prev")),
                    "w_prev", "left")
              .join(big.select(F.col("w1").alias("w_prev"),
                               F.col("w2").alias("w"), "c2"),
                    ["w_prev", "w"], "left")
              .select("doc_id", F.coalesce(
                  F.when(F.col("w_prev").isNull(),
                         F.col("c1_w").cast("double") / n_tokens)
                  .when(F.col("c2").isNotNull(),
                        F.col("c2").cast("double") / F.col("c1_prev"))
                  .otherwise(F.lit(0.4) * F.col("c1_w") / n_tokens),
                  F.lit(1e-9)).alias("s")))
    rows = _collect(spark, scored, "lm_stream")
    import math
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(math.log(r["s"]))
    batch = {r["doc_id"]: r["avg_logprob"]
             for r in lm.lm_doc_scores(static, lm=model).collect()}
    for k, logs in got.items():
        assert round(sum(logs) / len(logs), 6) == batch[k]
