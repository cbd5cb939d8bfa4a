"""Host-health sampler for the clean-window bench protocol (VERDICT r3
finding #3: re-measure q1/q5 when first-touch < 0.2 s/133 MB).

Appends one JSON line per invocation to BENCH/host_health.jsonl:
first-touch fault latency for fresh pages, cumulative steal %, load.
Exit code 0 = clean window (first_touch < threshold), 1 = degraded.

Usage: python tools/host_health.py [--threshold 0.2]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sample() -> dict:
    import numpy as np
    t0 = time.monotonic()
    a = np.empty(133 * 1024 * 1024 // 8)
    a[:] = 1.0
    first_touch = round(time.monotonic() - t0, 3)
    del a
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    steal = round(100.0 * v[7] / max(sum(v), 1), 3) if len(v) > 7 else 0.0
    load1 = os.getloadavg()[0]
    return {"unix": int(time.time()), "first_touch_133mb_sec": first_touch,
            "steal_cum_pct": steal, "load1": round(load1, 2)}


def main() -> int:
    thr = 0.2
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    s = sample()
    path = os.path.join(REPO, "BENCH", "host_health.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(s) + "\n")
    print(json.dumps(s))
    return 0 if s["first_touch_133mb_sec"] < thr else 1


if __name__ == "__main__":
    sys.exit(main())
