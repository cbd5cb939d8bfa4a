"""Throughput of the numpy-BERT RelCAT path at a realistic model size
(VERDICT r4 next-round #8): the fixture models certify correctness at
toy dims; this measures docs/s + pairs/s with a 4-layer / 256-dim /
4-head / 1024-intermediate BERT (~5M params) so nobody misreads
fixture-scale relation throughput as production posture.

Writes BENCH/rel_throughput.json and prints one JSON line.

Usage: python tools/rel_throughput.py [--replicate N] [--cores N]
       [--layers 4 --hidden 256 --heads 4 --inter 1024]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sized_rel_bert(layers: int, hidden: int, heads: int, inter: int):
    """RelCatBertModel with production-shaped dims, deterministic
    weights, BBPE + annotation-schema tags — same construction as
    relcat_bert_fixture_model, different size."""
    from medcat_spark.core.bbpe import train_bbpe
    from medcat_spark.functions.bert_np import (RelCatBertModel,
                                                bert_fixture_state_dict)
    tok = train_bbpe(
        ["spark merge window vector stream filter fast slow small",
         "hash join sort join table scan the key query",
         "patient heart attack diabetes kidney failure fever"] * 4,
        vocab_size=400)
    tag_ids = []
    for t in ("[s1]", "[e1]", "[s2]", "[e2]", "[CLS]", "[SEP]"):
        tok.vocab[t] = len(tok.vocab)
        tok.id2tok[tok.vocab[t]] = t
        if t.startswith("[s") or t.startswith("[e"):
            tag_ids.append(tok.vocab[t])
    sd = bert_fixture_state_dict(vocab_size=tok.get_size(), hidden=hidden,
                                 n_layers=layers, n_heads=heads,
                                 inter=inter, max_pos=512, nclasses=3)
    m = RelCatBertModel.from_state_dict(sd, ["Spatial", "Causal", "None"],
                                        n_heads=heads)
    m.tokenizer = tok
    m.tag_ids = tag_ids
    m.cntx_left = 10
    m.cntx_right = 10
    m.window_size_chars = 200
    m.max_seq_length = 128
    n_params = sum(int(v.size) for v in sd.values())
    return m, n_params


def main():
    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
    replicate = int(args.get("--replicate", "4"))
    cores = int(args.get("--cores", os.environ.get("SPARK_GRAFT_CPUS",
                                                   "32")))
    layers = int(args.get("--layers", "4"))
    hidden = int(args.get("--hidden", "256"))
    heads = int(args.get("--heads", "4"))
    inter = int(args.get("--inter", "1024"))

    from pyspark.sql import functions as F

    from medcat_spark import demo
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.functions.bert_np import relations_bert
    from medcat_spark.pipeline import annotate, broadcast_model
    from medcat_spark.session import get_spark

    spark = get_spark("rel-throughput", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    model, n_params = sized_rel_bert(layers, hidden, heads, inter)
    bc = spark.sparkContext.broadcast(model)
    base = demo.load_docs(spark, SF_DIR, spread=False)
    docs = (spark.range(replicate).crossJoin(base)
            .select(F.concat(F.col("doc_id").cast("string"),
                             F.lit("_"), F.col("id")).alias("doc_id"),
                    "text")
            .repartition(cores * 4, "doc_id").cache())
    n_docs = docs.count()
    bcm = broadcast_model(spark, demo.flagship_cdb(), VocabModel(),
                          EngineConfig())
    ann = annotate(docs, bcm, num_partitions=cores * 4).cache()
    n_ann = ann.count()

    rel = relations_bert(ann, docs, bc)
    rel.count()          # warmup: worker model caches + codegen
    t0 = time.monotonic()
    n_pairs = rel.count()
    wall = time.monotonic() - t0
    import numpy as np
    t1 = time.monotonic()
    buf = np.ones((20000, 26, 32))
    first_touch = round(time.monotonic() - t1, 2)
    del buf
    out = {
        "model": {"layers": layers, "hidden": hidden, "heads": heads,
                  "intermediate": inter, "n_params": n_params},
        "sf_dir": SF_DIR, "cores": cores,
        "n_docs": n_docs, "n_annotations": n_ann, "n_pairs": int(n_pairs),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "pairs_per_sec": round(n_pairs / wall, 1),
        "ms_per_pair_per_core": round(1000.0 * wall * cores
                                      / max(n_pairs, 1), 2),
        "host_first_touch_133mb_sec": first_touch,
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "rel_throughput.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
