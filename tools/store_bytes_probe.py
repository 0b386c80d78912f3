#!/usr/bin/env python
"""On-disk bytes/row of the persisted features snapshot — the artifact
the round-5 int8/int32 encoding shrinks (the OTHER claimed cut, kernel
DRAM traffic, is evidenced by the paired kernel timings in the commit
and BENCH.md; this one is directly measurable from parquet file sizes).

Runs the feature stage through a real SnapshotStore over the cached
scaling corpus and reports bytes-on-disk / rows.  Deterministic given
the code version, so HEAD-vs-r4 comparisons don't need a quiet window:
check out the other tree in a scratch worktree and run the same command.

Usage: python tools/store_bytes_probe.py [--pages 250000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPORA = "/tmp/scaling_corpora"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=250_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--label", default="")
    args = ap.parse_args()

    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage
    from biomedical_el_spark.session import get_spark
    from biomedical_el_spark.sources.snapshots import SnapshotStore

    spark = get_spark("store_bytes_probe", cores=args.cores)
    corpus = os.path.join(CORPORA, str(args.pages))
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from biomedical_el_spark.datagen.pages import generate_pages

        generate_pages(spark, args.pages, cluster_size=4).write.mode(
            "overwrite"
        ).parquet(corpus)

    tmp = tempfile.mkdtemp(prefix="store_bytes_")
    try:
        pages = spark.read.parquet(corpus)
        out = run_linkage(spark, pages, store=SnapshotStore(tmp))
        n_rows = out["features"].count()
        sizes = {}
        for stage in os.listdir(tmp):
            stage_dir = os.path.join(tmp, stage)
            if not os.path.isdir(stage_dir):
                continue
            total = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(stage_dir)
                for f in fs
                if f.endswith(".parquet")
            )
            sizes[stage] = total
        feat = next((v for k, v in sizes.items() if "features" in k), None)
        print(
            json.dumps(
                {
                    "label": args.label,
                    "pages": args.pages,
                    "features_rows": n_rows,
                    "features_bytes": feat,
                    "features_bytes_per_row": round(feat / n_rows, 1) if feat else None,
                    "all_stage_bytes": sizes,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
