#!/usr/bin/env python
"""Per-stage byte accounting for the flagship linkage run — the feedback
loop for the round-5 DRAM-traffic work (r4 verdict #2: the weak-scaling
ceiling is memory bandwidth; the lever is bytes moved per page).

Runs the flagship fresh (store=None) over the cached scaling corpus and
reports, from the Spark UI REST API (enabled just for this session):

  - total input / shuffle-read / shuffle-write / output bytes
  - bytes per page (the tracked metric)
  - the top stages by shuffle write, named, so regressions are
    attributable to a specific exchange

Bytes are deterministic (unlike wall time on this host) — two runs of the
same code agree to within AQE rounding, so BEFORE/AFTER comparisons don't
need a quiet window.  Wall time is printed too but is only meaningful
same-window.

Usage: python tools/bytes_probe.py [--pages 1000000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPORA = "/tmp/scaling_corpora"


def ensure_corpus(spark, n_pages: int) -> str:
    path = os.path.join(CORPORA, str(n_pages))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from biomedical_el_spark.datagen.pages import generate_pages

        generate_pages(spark, n_pages, cluster_size=4).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def rest(path: str) -> list | dict:
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage
    from biomedical_el_spark.session import get_spark

    spark = get_spark(
        "bytes_probe",
        cores=args.cores,
        extra_conf={"spark.ui.enabled": "true"},
    )
    corpus = ensure_corpus(spark, args.pages)

    t0 = time.time()
    pages = spark.read.parquet(corpus)
    out = run_linkage(spark, pages, cfg=LinkageConfig())
    out["clusters"].write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_clusters = None  # avoid extra jobs contaminating byte totals

    app = rest("/applications")[0]["id"]
    stages = rest(f"/applications/{app}/stages?status=COMPLETE")
    tot = {
        "input": sum(s["inputBytes"] for s in stages),
        "shuffle_read": sum(s["shuffleReadBytes"] for s in stages),
        "shuffle_write": sum(s["shuffleWriteBytes"] for s in stages),
        "output": sum(s["outputBytes"] for s in stages),
    }
    top = sorted(stages, key=lambda s: -s["shuffleWriteBytes"])[:8]
    report = {
        "label": args.label,
        "pages": args.pages,
        "cores": args.cores,
        "wall_sec": round(wall, 1),
        "bytes": tot,
        "bytes_per_page": {
            k: round(v / args.pages, 1) for k, v in tot.items()
        },
        "top_shuffle_stages": [
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "input_mb": round(s["inputBytes"] / 1e6, 1),
            }
            for s in top
        ],
    }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
