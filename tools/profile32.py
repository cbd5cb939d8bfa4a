"""One profiling pass on the 32-core Spark residual (VERDICT r3
findings #2/#4): where does the gap between local[8]→local[32] scaling
and the pure-multiprocessing ceiling go, and do 1-2 config changes
close it?

Protocol: the scaling-bench annotate+triples job (identical input,
replicate=240) at local[32] under config VARIANTS, each in its own
pinned subprocess JVM (1 warmup + 3 timed runs), plus a local[8]
baseline leg for the ratio.  Per timed run we record machine-wide
/proc/stat deltas (user/sys/idle/iowait/steal fractions) and a phase
split (annotate-only vs triples agg) — enough to attribute the
residual to page faults (sys), scheduling gaps (idle), shuffle/codec
cost (user growth without throughput), or the host (steal).

Usage:
  python tools/profile32.py                    # full sweep -> JSON
  python tools/profile32.py --run <variant> <master> <replicate>
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

VARIANTS: dict = {
    "baseline": {},
    "shuffle_nocompress": {"spark.shuffle.compress": "false",
                           "spark.shuffle.spill.compress": "false"},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "arrow_4k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "4096"},
    "arrow_32k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "32768"},
    "gc8": {"spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=8"},
}


def _stat():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    # user+nice, system+irq+softirq, idle, iowait, steal
    return (v[0] + v[1], v[2] + v[5] + v[6], v[3], v[4],
            v[7] if len(v) > 7 else 0)


def one(variant: str, master: str, replicate: int,
        warmups: int = 1, n_runs: int = 2) -> dict:
    from pyspark.sql import functions as F

    from medcat_spark import demo
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.pipeline import annotate, broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark("profile32", master=master, shuffle_partitions=cores,
                      extra_conf=VARIANTS[variant])
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

    def annotate_only():
        return annotate(docs, bc, num_partitions=cores * 4).count()

    def full_job():
        ann = annotate(docs, bc, num_partitions=cores * 4)
        dc = ann.select("doc_id", "cui").distinct().cache()
        mention_triples(dc, distinct=False).count()
        cooccurrence_triples(dc, materialize=False).count()
        dc.unpersist()

    for _ in range(warmups):
        full_job()

    runs = []
    for _ in range(n_runs):
        s0 = _stat()
        t0 = time.monotonic()
        annotate_only()
        t_ann = time.monotonic() - t0
        t1 = time.monotonic()
        full_job()
        t_full = time.monotonic() - t1
        s1 = _stat()
        tot = max(sum(b - a for a, b in zip(s0, s1)), 1)
        frac = [round((b - a) / tot, 4) for a, b in zip(s0, s1)]
        runs.append({"annotate_sec": round(t_ann, 3),
                     "full_sec": round(t_full, 3),
                     "cpu_frac": dict(zip(
                         ("user", "sys", "idle", "iowait", "steal"), frac))})
    spark.stop()
    med_ann = statistics.median(r["annotate_sec"] for r in runs)
    med_full = statistics.median(r["full_sec"] for r in runs)
    return {"variant": variant, "master": master, "n_docs": n_docs,
            "runs": runs,
            "annotate_docs_per_sec": round(n_docs / med_ann, 1),
            "median_annotate_sec": round(med_ann, 3),
            "median_full_sec": round(med_full, 3)}


def _sub(variant: str, master: str, replicate: int) -> dict:
    cores = int(master.split("[")[1].rstrip("]"))
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.abspath(__file__), "--run", variant, master,
           str(replicate)]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3600)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
    if not lines:
        return {"variant": variant, "master": master,
                "error": r.stderr[-500:]}
    return json.loads(lines[-1][len("RESULT "):])


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "--run":
        print("RESULT " + json.dumps(
            one(sys.argv[2], sys.argv[3], int(sys.argv[4]))), flush=True)
        return
    replicate = int(os.environ.get("PROFILE_REPLICATE", "96"))
    out = {"sf_dir": SF_DIR, "replicate": replicate, "legs": []}
    # interleave the 8-core reference leg between 32-core variants so a
    # host episode cannot land on only one side of the ratio
    plan = [("baseline", "local[8]")] + \
        [(v, "local[32]") for v in VARIANTS] + [("baseline", "local[8]")]
    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "host_health", os.path.join(os.path.dirname(__file__),
                                    "host_health.py"))
    hh = _ilu.module_from_spec(spec)
    spec.loader.exec_module(hh)
    for variant, master in plan:
        before = hh.sample()
        leg = _sub(variant, master, replicate)
        leg["host_before"] = before
        out["legs"].append(leg)
        print(json.dumps(leg), flush=True)
    with open(os.path.join(REPO, "BENCH", "profile32.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/profile32.json")


if __name__ == "__main__":
    main()
