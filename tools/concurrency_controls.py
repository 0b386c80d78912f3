"""Concurrency controls for the scaling evidence: per-core throughput of
three Spark-free workloads at N vs 4N concurrent pinned processes.

The weak-scaling gate question reduces to: why is a core SLOWER WHILE
BUSY when 16 of them run instead of 4 (measured work_linearity 2.1-2.3x
at near-full occupancy)?  Candidate shared resources, each measured
directly:

  cache_1mb   — cache-resident arithmetic copy (pure compute control)
  dram_64mb   — streaming copies (DRAM bandwidth control; 64 MB buffers
                so a 5 s window fits many iterations — a 256 MB first
                cut quantized to junk and was retracted)
  kernel      — the ACTUAL feature kernel (hash-projection embedder +
                numpy minhash over representative page texts): the
                workload's own concurrency ceiling, no Spark in the loop

A per-core ratio near 1.0 means that resource does NOT explain the
inflation; the ratios bound the engine-side share of the gap.  Writes
tools/concurrency_controls.json.

Usage: python tools/concurrency_controls.py [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def copy_worker(q, cpu: int, nbytes: int, secs: float) -> None:
    os.sched_setaffinity(0, {cpu})
    src = np.ones(nbytes // 8, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault pages in BEFORE the timed window
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        np.copyto(dst, src)
        src[0] += 1.0  # defeat any elision
        n += 1
    q.put(n * nbytes * 2 / (time.time() - t0))  # read+write bytes/s


def kernel_worker(q, cpu: int, secs: float) -> None:
    os.sched_setaffinity(0, {cpu})
    import pandas as pd

    from biomedical_el_spark.functions.embedder import DIM, _embed_batch
    from biomedical_el_spark.functions.minhash_np import minhash_batch

    texts = pd.Series(
        [f"token{i % 97} the quick brown page body " * 20 for i in range(2000)]
    )
    _embed_batch(texts, DIM)
    minhash_batch(texts, 32)  # warm
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        _embed_batch(texts, DIM)
        minhash_batch(texts, 32)
        n += len(texts)
    q.put(n / (time.time() - t0))  # pages/s per core


def measure(target, cores: int, args: tuple, secs: float) -> dict:
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [
        ctx.Process(target=target, args=(q, c, *args, secs))
        for c in range(cores)
    ]
    [p.start() for p in ps]
    rates = sorted(q.get() for _ in ps)
    [p.join() for p in ps]
    return {"mean": sum(rates) / len(rates), "min": rates[0], "max": rates[-1]}


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {"lo_cores": lo, "hi_cores": hi}
    for name, target, args, secs, unit in (
        ("cache_1mb", copy_worker, (1 << 20,), 5.0, "GB/s"),
        ("dram_64mb", copy_worker, (64 << 20,), 5.0, "GB/s"),
        ("kernel", kernel_worker, (), 8.0, "pages/s"),
    ):
        m_lo = measure(target, lo, args, secs)
        m_hi = measure(target, hi, args, secs)
        scale = 1e9 if unit == "GB/s" else 1.0
        out[name] = {
            "unit": f"per-core {unit}",
            f"percore_{lo}c": round(m_lo["mean"] / scale, 2),
            f"percore_{hi}c": round(m_hi["mean"] / scale, 2),
            "per_core_ratio_hi_over_lo": round(m_hi["mean"] / m_lo["mean"], 3),
        }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tools", "concurrency_controls.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
