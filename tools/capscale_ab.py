"""A/B the oversized-block controls at 1M pages (judge round-3 item 5):

  r3        — cap evicts oversized blocks outright (round-3 behavior)
  star      — cap-escape: oversized blocks emit b−1 hub pairs
  star_auto — star + data-proportional hyperplane capacity (the round-4
              default: ~16 pages per embedding bucket at any corpus size)

Each arm runs the flagship in a fresh JVM pinned to 16 cores on the same
materialized corpus (scaling-bench cache).  Reports wall sec, candidate
pair count, candidate recall (gold pairs surviving into the capped pair
set — the quantity the cap eviction was bounding), and unconditioned
link-level P/R/F1.  Writes tools/capscale_ab.json.

Usage: python tools/capscale_ab.py [n_pages]  (default 1,000,000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from biomedical_el_spark.session import get_spark
from biomedical_el_spark.plans.linkage import run_linkage, LinkageConfig
from biomedical_el_spark.datagen.pages import gold_pairs
from biomedical_el_spark import metrics as M
from pyspark.sql import functions as F

arm = sys.argv[1]; pages_dir = sys.argv[2]
cfgs = {
    "r3": LinkageConfig(oversized_escape=None, auto_hyperplanes=False),
    "star": LinkageConfig(oversized_escape="star", auto_hyperplanes=False),
    "star_auto": LinkageConfig(oversized_escape="star", auto_hyperplanes=True),
}
cfg = cfgs[arm]
cores = 16
spark = get_spark("capscale-ab", cores=cores, shuffle_partitions=2 * cores)
pages = spark.read.parquet(pages_dir)
pages.count()

import dataclasses
warm_cfg = dataclasses.replace(cfg, num_partitions=2 * cores)
warm = run_linkage(spark, pages.limit(20000), cfg=warm_cfg)
warm["clusters"].write.format("noop").mode("overwrite").save()
for df in warm.values():
    df.unpersist()

t0 = time.time()
out = run_linkage(spark, pages, cfg=cfg)
out["clusters"].write.format("noop").mode("overwrite").save()
dt = time.time() - t0

gold = gold_pairs(pages).persist()
n_gold = gold.count()
covered = gold.join(
    out["pairs"].select("url_a", "url_b"), ["url_a", "url_b"], "left_semi"
).count()
pred = out["links"].select("url_a", "url_b")
f1 = M.pairwise_f1(pred, gold)
print("RESULT " + json.dumps({
    "arm": arm,
    "sec": round(dt, 2),
    "n_pairs": out["pairs"].count(),
    "candidate_recall": round(covered / n_gold, 6),
    "precision": round(f1["precision"], 6),
    "recall": round(f1["recall"], 6),
    "f1": round(f1["f1"], 6),
}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.scaling_bench import ensure_corpora  # noqa: E402

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = os.environ.get("SCALING_CORPUS_ROOT", "/tmp/scaling_corpora")
    pages_dir = ensure_corpora(repo, [n_pages], root)[n_pages]

    results = {}
    for arm in ("r3", "star", "star_auto"):
        proc = subprocess.run(
            ["taskset", "-c", "0-15", sys.executable, "-c",
             RUNNER.replace("@REPO@", repo), arm, pages_dir],
            capture_output=True, text=True, timeout=3600,
        )
        got = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                got = json.loads(line[len("RESULT "):])
        if got is None:
            raise RuntimeError(f"{arm} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        print(got, flush=True)
        results[arm] = got

    results["n_pages"] = n_pages
    with open(os.path.join(repo, "tools", "capscale_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
