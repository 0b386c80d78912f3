"""Memory-bandwidth contention control for the scaling evidence.

The 16M-page weak point shows ~0.96 task occupancy on BOTH legs — the
engine keeps every core fed — yet raw weak efficiency sits near 0.42.
If per-core progress WHILE BUSY is what degrades at 16 concurrent heavy
tasks, the cause on a single box is shared-resource contention (DRAM
bandwidth, LLC), which a real 4N-executor fleet does not have: each
executor host brings its own memory bus.

This control measures exactly that, with no Spark in the loop: per-core
throughput of (a) a cache-resident workload (1 MB working set — should
scale ~1.0 with core count) and (b) a DRAM-bound workload (256 MB
streaming copies) at N vs 4N concurrent pinned processes.  The (b)
ratio is the single-box ceiling any memory-intensive engine inherits at
4N local cores; (a) isolates it from scheduler/vCPU effects.

Writes tools/membw_control.json.
Usage: python tools/membw_control.py [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def worker(q, cpu: int, nbytes: int, secs: float) -> None:
    os.sched_setaffinity(0, {cpu})
    src = np.ones(nbytes // 8, dtype=np.float64)
    dst = np.empty_like(src)
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        np.copyto(dst, src)
        src[0] += 1.0  # defeat any elision
        n += 1
    q.put(n * nbytes * 2 / (time.time() - t0))  # read+write bytes/s


def measure(cores: int, nbytes: int, secs: float = 3.0) -> float:
    """Mean per-core bytes/s with `cores` concurrent pinned copies."""
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [
        ctx.Process(target=worker, args=(q, c, nbytes, secs))
        for c in range(cores)
    ]
    [p.start() for p in ps]
    rates = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(rates) / len(rates)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {"lo_cores": lo, "hi_cores": hi}
    for name, nbytes in (("cache_1mb", 1 << 20), ("dram_256mb", 256 << 20)):
        b_lo = measure(lo, nbytes)
        b_hi = measure(hi, nbytes)
        out[name] = {
            f"per_core_gbps_{lo}c": round(b_lo / 1e9, 2),
            f"per_core_gbps_{hi}c": round(b_hi / 1e9, 2),
            "per_core_ratio_hi_over_lo": round(b_hi / b_lo, 3),
        }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tools", "membw_control.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
