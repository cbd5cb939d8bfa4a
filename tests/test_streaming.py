"""Structured Streaming annotate: file source, availableNow trigger,
exactly-once resume via the stream checkpoint."""

from medcat_spark.config import EngineConfig
from medcat_spark.pipeline import annotate, broadcast_model
from medcat_spark.streaming.annotate_stream import run_stream_to_parquet


def test_stream_matches_batch(spark, fixture_models, tmp_path):
    cdb, vocab = fixture_models
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())

    texts = [
        ("s1", "patient admitted with heart attack and high temperature"),
        ("s2", "history of diabetes mellitus and chronic kidney failure"),
        ("s3", "severe renal failure with fever and chest pain"),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(texts, "doc_id string, text string")
    docs.write.parquet(src)

    run_stream_to_parquet(spark, src, "doc_id string, text string",
                          bc, out, ckpt)
    got = spark.read.parquet(out)
    want = annotate(docs, bc)
    key = ["doc_id", "start", "cui"]
    assert got.select(*key).exceptAll(want.select(*key)).count() == 0
    assert want.select(*key).exceptAll(got.select(*key)).count() == 0

    # second availableNow run with same checkpoint: no new input -> no dupes
    run_stream_to_parquet(spark, src, "doc_id string, text string",
                          bc, out, ckpt)
    assert spark.read.parquet(out).count() == want.count()

    # new file appears -> only the new docs are processed
    more = spark.createDataFrame(
        [("s4", "movar viruses detected in the left ward")],
        "doc_id string, text string")
    more.write.mode("append").parquet(src)
    run_stream_to_parquet(spark, src, "doc_id string, text string",
                          bc, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.where("doc_id = 's4'").count() > 0
    assert got2.count() == want.count() + \
        annotate(more, bc).count()
