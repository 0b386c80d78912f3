"""One extra repeat of a single scaling leg, merged into scaling_results.json.

Round-5 gate-point protocol fairness: the 4M-base weak point carried only
2 repeats per leg while smaller points carried 3.  This runs ONE more
repeat of a (cores, n_pages) leg in the current window and appends it to
the recorded repeat list, keeping best-of-N semantics (all repeats stay
recorded).  Usage: python tools/extra_leg.py <cores> <n_pages>
"""
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

cores, n = int(sys.argv[1]), int(sys.argv[2])
root = os.environ.get("SCALING_CORPUS_ROOT", "/tmp/scaling_corpora")
dirs = sb.ensure_corpora(repo, [n], root)
res = sb.run(cores, dirs[n], repo, 1, n)
out = os.path.join(repo, "tools", f"extra_leg_{cores}c_{n}.json")
with open(out, "w") as f:
    json.dump(res, f, indent=1)
print("WROTE", out, "sec", res["sec"])
