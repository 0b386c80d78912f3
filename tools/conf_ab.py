"""Paired same-window A/B of session confs / partition width on one
pinned flagship leg.

Runs the EXACT scaling_bench leg protocol (taskset pinning, memory-fair
heap, untimed warm-up, spin controls, occupancy sampler) once per
variant, interleaved A,B,A,B so host drift hits both sides equally.

Usage:
  python tools/conf_ab.py <cores> <n_pages> <label_a> <conf_json_a> \
                          <label_b> <conf_json_b> [pairs]

conf_json is {"conf": {...spark confs...}, "npart": int|null,
"cfg": {...LinkageConfig field overrides...}}.
Results append to tools/conf_ab_results.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "sb", os.path.join(repo, "tools", "scaling_bench.py")
)
sb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sb)


def _sample_dirty(stop, out: dict) -> None:
    """1 Hz host-wide dirty-page sampler: is the leg hitting the kernel's
    writeback thresholds (vm.dirty_background_ratio / vm.dirty_ratio)?
    Past the background threshold the disk competes with the leg; past
    the hard ratio, writers throttle synchronously."""
    import time

    mx = 0
    total = cnt = 0
    while not stop.is_set():
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Dirty:"):
                    kb = int(line.split()[1])
                    mx = max(mx, kb)
                    total += kb
                    cnt += 1
                    break
        stop.wait(1.0)
    out["dirty_max_mb"] = round(mx / 1024, 1)
    out["dirty_mean_mb"] = round(total / max(cnt, 1) / 1024, 1)


def run_variant(cores: int, n: int, corpus: str, spec_: dict) -> dict:
    import threading

    os.environ["SPARK_GRAFT_AB_CONF"] = json.dumps(spec_.get("conf", {}))
    os.environ["SPARK_GRAFT_AB_CFG"] = json.dumps(spec_.get("cfg", {}))
    if spec_.get("npart"):
        os.environ["SPARK_GRAFT_AB_NPART"] = str(spec_["npart"])
    else:
        os.environ.pop("SPARK_GRAFT_AB_NPART", None)
    stop, dirty = threading.Event(), {}
    th = threading.Thread(target=_sample_dirty, args=(stop, dirty), daemon=True)
    th.start()
    try:
        res = sb.run(cores, corpus, repo, 1, n)
    finally:
        stop.set()
        th.join(timeout=3)
        os.environ.pop("SPARK_GRAFT_AB_CONF", None)
        os.environ.pop("SPARK_GRAFT_AB_CFG", None)
        os.environ.pop("SPARK_GRAFT_AB_NPART", None)
    res.update(dirty)
    return res


def main() -> None:
    cores, n = int(sys.argv[1]), int(sys.argv[2])
    label_a, spec_a = sys.argv[3], json.loads(sys.argv[4])
    label_b, spec_b = sys.argv[5], json.loads(sys.argv[6])
    pairs = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    root = os.environ.get("SCALING_CORPUS_ROOT", "/tmp/scaling_corpora")
    corpus = sb.ensure_corpora(repo, [n], root)[n]

    out_path = os.path.join(repo, "tools", "conf_ab_results.json")
    results = []
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    for i in range(pairs):
        for label, spec_ in ((label_a, spec_a), (label_b, spec_b)):
            r = run_variant(cores, n, corpus, spec_)
            row = {
                "cores": cores, "n_pages": n, "label": label, "spec": spec_,
                "sec": r["sec"], "occupancy": r["occupancy"],
                "dead_frac": r["dead_frac"],
                "spin_before": r["spin_before"]["max_over_min"],
                "spin_after": r["spin_after"]["max_over_min"],
                "dirty_max_mb": r.get("dirty_max_mb"),
                "dirty_mean_mb": r.get("dirty_mean_mb"),
                "pair_idx": i,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
