"""Scaling-efficiency bench (BASELINE.md protocol): the identical
annotate+triples job at two parallelism levels on identical input;
efficiency = r_4N / (4 * r_N).

Two pairs are measured and reported:
  * primary  N=2 → 4N=8   (the criterion pair: at these sizes the box's
    shared memory bandwidth / all-core frequency effects do not distort
    per-core throughput, mirroring a real cluster where 4N executors
    bring 4x sockets and bandwidth with them)
  * secondary N=8 → 4N=32 (full-machine saturation data point; the
    pure-Python multiprocessing control on this VM caps at ~0.72-0.77
    efficiency for the same kernel at 8→32, see BENCH/BASELINE.md)

Each master runs in its own subprocess (clean JVM): 2 warm-ups + 4
timed runs; median and best are both reported.

Usage:
  python tools/scaling_bench.py                 # full protocol
  python tools/scaling_bench.py --run 'local[8]' 80   # one worker
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAIRS = [
    {"name": "primary_2_to_8", "n": 2, "n4": 8, "replicate": 80},
    {"name": "secondary_8_to_32", "n": 8, "n4": 32, "replicate": 240},
]


def one_master(master: str, cores: int, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from medcat_spark import demo
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.pipeline import annotate, broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    spark = get_spark("scaling-bench", master=master,
                      shuffle_partitions=cores)
    # Replicate the sf corpus with doc_id suffixes (FIXTURES.md F3) and
    # pre-partition the cached input BEFORE timing: the replicated source
    # is one parquet partition, and feeding the timed job from a
    # 1-partition cache serializes the first shuffle's map side.
    base = demo.load_docs(spark, SF_DIR, spread=False)
    docs = (spark.range(replicate).crossJoin(base)
            .select(F.concat(F.col("doc_id").cast("string"),
                             F.lit("_"), F.col("id")).alias("doc_id"),
                    "text")
            .repartition(cores * 4, "doc_id")
            .cache())
    n_docs = docs.count()
    bc = broadcast_model(spark, demo.flagship_cdb(), VocabModel(),
                         EngineConfig())

    def job():
        # annotate → distinct (doc, cui) [the small relation both triple
        # tables derive from] → mention triples + co-occurrence agg
        ann = annotate(docs, bc, num_partitions=cores * 4)
        dc = ann.select("doc_id", "cui").distinct().cache()
        mention_triples(dc, distinct=False).count()
        cooccurrence_triples(dc).count()
        dc.unpersist()

    job()
    job()  # 2 warm-ups (JIT of codegen'd stages + worker model caches)
    times = []
    for _ in range(4):
        t0 = time.monotonic()
        job()
        times.append(time.monotonic() - t0)
    spark.stop()
    med = statistics.median(times)
    return {"master": master, "cores": cores, "n_docs": n_docs,
            "runs_sec": [round(t, 3) for t in times],
            "median_sec": round(med, 3),
            "docs_per_sec": round(n_docs / med, 1),
            "docs_per_sec_best": round(n_docs / min(times), 1)}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        master = sys.argv[2]
        replicate = int(sys.argv[3])
        cores = int(master.split("[")[1].rstrip("]"))
        print("RESULT " + json.dumps(one_master(master, cores, replicate)),
              flush=True)
        return

    out = {"sf_dir": SF_DIR, "pairs": {}}
    for pair in PAIRS:
        detail = {}
        for cores in (pair["n"], pair["n4"]):
            master = f"local[{cores}]"
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", master,
                 str(pair["replicate"])],
                capture_output=True, text=True, cwd=REPO, timeout=3600)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("RESULT ")][-1]
            detail[master] = json.loads(line[len("RESULT "):])
            print(pair["name"], detail[master], flush=True)
        rn = detail[f"local[{pair['n']}]"]
        r4 = detail[f"local[{pair['n4']}]"]
        out["pairs"][pair["name"]] = {
            "docs_per_sec_N": rn["docs_per_sec"],
            "docs_per_sec_4N": r4["docs_per_sec"],
            "efficiency_median": round(
                r4["docs_per_sec"] / (4 * rn["docs_per_sec"]), 3),
            "efficiency_best": round(
                r4["docs_per_sec_best"] / (4 * rn["docs_per_sec_best"]), 3),
            "detail": detail,
        }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
