"""A/B the TF-IDF rare-shingle blocking channel in the flagship pipeline
(judge round-2 item 7: measure recall/F1/wall-time delta at bench shape;
flip `LinkageConfig.use_tfidf_blocks` default if recall improves at
acceptable cost — either way, document the decision).

Each arm runs in a fresh JVM pinned to 16 cores on the same materialized
1M-page corpus (reuses the scaling-bench corpus cache).  Reports, per
arm: engine wall sec, candidate-pair count, blocking recall (fraction of
gold pairs sharing ≥1 block key — the only number the extra channel can
move), and end-to-end pairwise F1.

Writes tools/tfidf_ab.json; `python tools/scaling_bench.py` folds it
into BENCH.md.

Usage: python tools/tfidf_ab.py [n_pages]  (default 1,000,000)
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

use_tfidf = sys.argv[1] == "tfidf"; pages_dir = sys.argv[2]
cores = 16
spark = get_spark("tfidf-ab", cores=cores, shuffle_partitions=2 * cores)
pages = spark.read.parquet(pages_dir)
pages.count()
cfg = LinkageConfig(use_tfidf_blocks=use_tfidf)

warm = run_linkage(spark, pages.limit(20000), cfg=cfg)
warm["clusters"].write.format("noop").mode("overwrite").save()
for df in warm.values():
    df.unpersist()

t0 = time.time()
out = run_linkage(spark, pages, cfg=cfg)
out["clusters"].write.format("noop").mode("overwrite").save()
dt = time.time() - t0

gold = gold_pairs(pages).persist()
n_gold = gold.count()
# candidate recall: gold pairs that SURVIVE into the (block-size-capped)
# candidate set — the operational quantity the extra channel can move.
# (Raw-block recall via an uncapped block self-join is quadratic in hot
# hyperplane buckets at 1M pages — measured 56 GB of shuffle before
# being killed; the pipeline itself never materializes that join.)
covered = gold.join(
    out["pairs"].select("url_a", "url_b"), ["url_a", "url_b"], "left_semi"
).count()
pred = out["links"].select("url_a", "url_b")
f1 = M.pairwise_f1(pred, gold)
print("RESULT " + json.dumps({
    "arm": "tfidf" if use_tfidf else "base",
    "sec": round(dt, 2),
    "n_pairs": out["pairs"].count(),
    "blocking_recall": round(covered / n_gold, 6),
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
    for arm in ("base", "tfidf"):
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
    results["decision"] = (
        "enable" if results["tfidf"]["recall"] > results["base"]["recall"]
        and results["tfidf"]["sec"] <= 1.25 * results["base"]["sec"]
        else "keep-default-off"
    )
    with open(os.path.join(repo, "tools", "tfidf_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
