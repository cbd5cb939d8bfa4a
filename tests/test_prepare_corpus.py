"""jobs/prepare_corpus.py — the end-to-end training-data pipeline."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("prep") / "docs.parquet")
    rows = []
    for i in range(60):
        # three good C4 lines; doc i and i+30 share a paragraph
        body = (f"first proper line of document {i % 30} goes here.\n"
                f"second proper line number {i} appears right here.\n"
                f"third proper line of text {i} finishes the doc.")
        rows.append((i, body, "en", "web" if i % 3 else "books"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(p)
    return p


def test_full_pipeline(spark, corpus_path, tmp_path):
    from jobs.prepare_corpus import main
    out = str(tmp_path / "clean")
    m = main(["--docs", corpus_path, "--out", out,
              "--langs", "en", "--min-tokens", "5",
              "--c4", "--paragraph-dedup",
              "--lm-threshold", "-12.0",
              "--mix-alpha", "0.5", "--mix-frac", "0.9",
              "--ctx-len", "16"])
    # counts are monotone non-increasing through the stages
    order = ["input_docs", "after_quality_dedup", "after_c4",
             "after_paragraph_dedup", "after_lm", "after_mix"]
    vals = [m[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert m["input_docs"] == 60
    # paragraph dedup dropped the shared first lines of docs 30..59
    assert m["after_paragraph_dedup"] <= m["after_c4"]
    assert m["output_docs"] == m["after_mix"] > 0
    assert os.path.exists(out)
    packed = spark.read.parquet(out + "_packed")
    assert packed.columns == ["chunk_id", "doc_id", "tok_start",
                              "n_tokens"]
    assert m["packed_chunks"] > 0
    # survivors retain every input column
    surv = spark.read.parquet(out)
    for c in ("doc_id", "text", "lang", "source"):
        assert c in surv.columns


def test_iceberg_sink(spark, corpus_path, tmp_path):
    from jobs.prepare_corpus import main
    from medcat_spark.sources.iceberg import IcebergTable
    out = str(tmp_path / "clean_ice")
    m = main(["--docs", corpus_path, "--out", out, "--sink", "iceberg",
              "--min-tokens", "5"])
    t = IcebergTable.load(out)
    df = t.to_df(spark)
    assert df.count() == m["output_docs"] > 0


def test_classifier_stage(spark, corpus_path, tmp_path):
    from jobs.prepare_corpus import main
    seed = str(tmp_path / "seed.parquet")
    spark.read.parquet(corpus_path).where("doc_id % 10 = 0") \
        .select("doc_id", "text").write.parquet(seed)
    out = str(tmp_path / "clean_clf")
    m = main(["--docs", corpus_path, "--out", out, "--min-tokens", "5",
              "--clf-seed", seed, "--clf-keep-frac", "0.5"])
    assert 0 < m["after_classifier"] <= m["after_quality_dedup"]
    assert "clf_cutoff" in m
