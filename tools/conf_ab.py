"""Paired same-window A/B of session confs / partition width on one
pinned flagship leg.

Runs the EXACT scaling_bench leg protocol (taskset pinning, memory-fair
heap, untimed warm-up, spin controls, occupancy sampler) once per
variant, interleaved A,B,A,B so host drift hits both sides equally.

Usage:
  python tools/conf_ab.py <cores> <n_pages> <label_a> <conf_json_a> \
                          <label_b> <conf_json_b> [pairs]

conf_json is {"conf": {...spark confs...}, "npart": int|null}.
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


def run_variant(cores: int, n: int, corpus: str, spec_: dict) -> dict:
    os.environ["SPARK_GRAFT_AB_CONF"] = json.dumps(spec_.get("conf", {}))
    if spec_.get("npart"):
        os.environ["SPARK_GRAFT_AB_NPART"] = str(spec_["npart"])
    else:
        os.environ.pop("SPARK_GRAFT_AB_NPART", None)
    try:
        return sb.run(cores, corpus, repo, 1, n)
    finally:
        os.environ.pop("SPARK_GRAFT_AB_CONF", None)
        os.environ.pop("SPARK_GRAFT_AB_NPART", None)


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
                "pair_idx": i,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
