"""Per-STAGE attribution for the 8→32 scaling residual (VERDICT r4
"what's wrong" #3: "per-stage timings — not whole-run CPU fractions —
proving the remainder is kernel-fault time outside engine control").

Runs the identical annotate+triples job as tools/scaling_bench.py at
local[8] and local[32] and records, for the TIMED run only:

  * per-stage Spark metrics from the REST status API (executorRunTime,
    executorCpuTime, jvmGcTime, deserialize, shuffle read/write bytes +
    fetch-wait/write time, task count) — run−cpu per stage is off-CPU
    time: Python-worker wait + page-fault stalls + shuffle IO;
  * direct page-fault counters: minflt/majflt deltas from
    /proc/<pid>/stat for the JVM and every pyspark.daemon worker, plus
    each process's utime/stime split — kernel time spent IN the fault
    path shows up as stime against a near-zero JVM-side gap;
  * system-wide /proc/stat deltas (user/sys/iowait/steal) bracketing
    the run.

Output: one JSON file (default BENCH/stage_attribution.json) with both
legs; each is host-health-stamped so a degraded-window run is
self-labelling.

Usage:
  python tools/stage_profile.py [--out BENCH/stage_attribution.json]
  python tools/stage_profile.py --run 'local[8]' 240   # one worker leg
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UI_PORT = 4077


def _proc_stat(pid: int):
    """(utime+stime jiffies user, stime jiffies, minflt, majflt)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().split(") ")[-1].split()
        # fields after comm: state(0) ... minflt(7) cminflt(8) majflt(9)
        # cmajflt(10) utime(11) stime(12) (0-based in this slice)
        return {"utime": int(parts[11]), "stime": int(parts[12]),
                "minflt": int(parts[7]), "majflt": int(parts[9])}
    except (OSError, IndexError, ValueError):
        return None


def _python_workers() -> list:
    out = subprocess.run(["pgrep", "-f", "pyspark.daemon"],
                         capture_output=True, text=True)
    return [int(p) for p in out.stdout.split()]


def _sys_stat():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return {"user": v[0] + v[1], "sys": v[2], "idle": v[3],
            "iowait": v[4], "steal": v[7] if len(v) > 7 else 0}


def _stages(app_id: str) -> list:
    url = (f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
           "/stages?status=complete")
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def one_leg(master: str, replicate: int) -> dict:
    from pyspark.sql import functions as F

    from medcat_spark import demo
    from medcat_spark.config import EngineConfig
    from medcat_spark.core.model import VocabModel
    from medcat_spark.pipeline import annotate, broadcast_model
    from medcat_spark.session import get_spark
    from medcat_spark.triples import cooccurrence_triples, mention_triples

    cores = int(master.split("[")[1].rstrip("]"))
    extra = {"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)}
    if os.environ.get("SCALING_MALLOC_TUNE", "1") == "1":
        # mirror the scaling bench's default fixed pre-touched heap so
        # attribution measures the shipping configuration (1.5 GB/core
        # like a real executor, floor 4g)
        from medcat_spark.session import fixed_heap_conf
        extra.update(fixed_heap_conf(os.environ.get(
            "SCALING_HEAP", f"{max(4, min(32, round(cores * 1.5)))}g")))
    spark = get_spark("stage-profile", master=master,
                      shuffle_partitions=cores, extra_conf=extra)
    app_id = spark.sparkContext.applicationId
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
        ann = annotate(docs, bc, num_partitions=cores * 4)
        dc = ann.select("doc_id", "cui").distinct().cache()
        mention_triples(dc, distinct=False).count()
        cooccurrence_triples(dc, materialize=False).count()
        dc.unpersist()

    job()       # warmup: codegen JIT + worker model caches + page touch
    seen = {s["stageId"] for s in _stages(app_id)}
    jvm_pid = os.getpid()   # local mode: driver JVM is a child; find it
    # the gateway JVM is our direct child running java
    out = subprocess.run(["pgrep", "-P", str(jvm_pid), "java"],
                         capture_output=True, text=True)
    jpids = [int(p) for p in out.stdout.split()]
    wpids = _python_workers()
    p0 = {p: _proc_stat(p) for p in jpids + wpids}
    s0 = _sys_stat()
    t0 = time.monotonic()
    job()
    wall = time.monotonic() - t0
    s1 = _sys_stat()
    # workers may have been forked during the run; snapshot the union
    wpids1 = set(_python_workers()) | set(wpids)
    p1 = {p: _proc_stat(p) for p in set(jpids) | wpids1}

    def delta(pids):
        agg = {"utime": 0, "stime": 0, "minflt": 0, "majflt": 0}
        for p in pids:
            a, b = p0.get(p), p1.get(p)
            if b is None:
                continue
            if a is None:       # born during the run: count from zero
                a = {k: 0 for k in agg}
            for k in agg:
                agg[k] += b[k] - a[k]
        return agg

    stages = [s for s in _stages(app_id) if s["stageId"] not in seen]
    stage_rows = []
    for s in sorted(stages, key=lambda s: s["stageId"]):
        run_ms = s.get("executorRunTime", 0)
        cpu_ms = s.get("executorCpuTime", 0) / 1e6   # ns -> ms
        stage_rows.append({
            "stage": s["stageId"],
            "name": (s.get("name") or "")[:70],
            "tasks": s.get("numCompleteTasks"),
            "run_ms": run_ms,
            "cpu_ms": round(cpu_ms, 1),
            "off_cpu_ms": round(run_ms - cpu_ms, 1),
            "gc_ms": s.get("jvmGcTime"),
            "shuffle_read_mb": round(
                s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(
                s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "fetch_wait_ms": s.get("shuffleFetchWaitTime"),
            "shuffle_write_ms": round(
                s.get("shuffleWriteTime", 0) / 1e6, 1),
        })
    sys_delta = {k: s1[k] - s0[k] for k in s0}
    tck = os.sysconf("SC_CLK_TCK")
    leg = {
        "master": master, "cores": cores, "n_docs": n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "stages": stage_rows,
        "totals": {
            "run_ms": sum(r["run_ms"] for r in stage_rows),
            "cpu_ms": round(sum(r["cpu_ms"] for r in stage_rows), 1),
            "off_cpu_ms": round(
                sum(r["off_cpu_ms"] for r in stage_rows), 1),
            "gc_ms": sum(r["gc_ms"] or 0 for r in stage_rows),
        },
        "jvm_proc": delta(jpids),
        "python_workers_proc": delta(wpids1),
        "n_python_workers": len(wpids1),
        "sys_stat_delta_jiffies": sys_delta,
        "clk_tck": tck,
    }
    for key in ("jvm_proc", "python_workers_proc"):
        d = leg[key]
        d["utime_sec"] = round(d.pop("utime") / tck, 2)
        d["stime_sec"] = round(d.pop("stime") / tck, 2)
    spark.stop()
    return leg


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        print("RESULT " + json.dumps(
            one_leg(sys.argv[2], int(sys.argv[3]))), flush=True)
        return
    out_path = os.path.join(REPO, "BENCH", "stage_attribution.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    from tools.host_health import sample  # noqa: E402
    legs = []
    for master, repl in (("local[8]", 240), ("local[32]", 240)):
        cmd = [sys.executable, os.path.abspath(__file__), "--run",
               master, str(repl)]
        cores = int(master.split("[")[1].rstrip("]"))
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                           timeout=3600, env=dict(os.environ))
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        legs.append(json.loads(line[len("RESULT "):]))
        print(json.dumps({k: legs[-1][k] for k in
                          ("master", "wall_sec", "docs_per_sec",
                           "totals", "jvm_proc",
                           "python_workers_proc")}), flush=True)
    r8, r32 = legs
    eff = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    result = {"sf_dir": SF_DIR, "host": sample(),
              "efficiency_8_to_32": round(eff, 3), "legs": legs}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}; eff={eff:.3f}")


if __name__ == "__main__":
    main()
