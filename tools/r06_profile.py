#!/usr/bin/env python
"""Round-6 measurement harness (guide §1: measure first).

Modes:
  catalog  — time each bench catalog query (noop sink, N repeats) and dump
             .explain("formatted") to plans/r06/<q>_<tag>.txt
  linkage  — stage-by-stage timing of the flagship at bench shape
             (generate pages -> parquet -> features/blocks/pairs/scored/
             links/clusters, each materialized via noop in order, so each
             persisted stage's own cost is isolated)

Usage: python tools/r06_profile.py catalog [tag] [query ...]
       python tools/r06_profile.py linkage [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "er_minhash_blocks",
    "er_tfidf_blocks",
    "er_candidate_pairs",
    "er_min2_pairs",
    "er_capped_star_pairs",
    "d_near_dup_pairs",
    "er_simhash",
    "er_fingerprint",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_multiprobe_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    "w_bio_decode",
    "w_bio_decode_subword",
    "cc_customer_nation_region",
    "q1_pricing_summary",
    "q3_order_revenue",
    "w_running_total",
    "j_interval_overlap",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def catalog_mode(tag: str, only: list[str]) -> None:
    from biomedical_el_spark.plans import catalog
    from biomedical_el_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06_profile", cores=cpus, shuffle_partitions=cpus)
    plans_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    # warmup (same as bench.py)
    _noop(catalog.QUERIES["q1_pricing_summary"](spark, sf_dir))
    _noop(catalog.QUERIES["er_minhash_blocks"](spark, sf_dir))

    names = only or BENCH_QUERIES
    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r06:{name}")
        times = []
        for _ in range(3):
            t0 = time.time()
            _noop(catalog.QUERIES[name](spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        out[name] = times
        df = catalog.QUERIES[name](spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(mode))
        print(json.dumps({name: times, "min": min(times)}), flush=True)
    print(json.dumps({"tag": tag, "times": out}))


def linkage_mode(n_pages: int) -> None:
    from biomedical_el_spark.datagen.pages import generate_pages
    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage
    from biomedical_el_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06_linkage_profile", cores=cpus, shuffle_partitions=2 * cpus)
    pages_dir = tempfile.mkdtemp(prefix="r06_pages_")
    try:
        generate_pages(spark, n_pages, cluster_size=4).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        for rep in range(2):
            pages = spark.read.parquet(pages_dir)
            t_all0 = time.time()
            out = run_linkage(spark, pages, cfg=LinkageConfig())
            stage_times = {}
            for stage in ["features", "blocks", "pairs", "scored", "links", "clusters"]:
                spark.sparkContext.setJobDescription(f"r06:linkage:{stage}")
                t0 = time.time()
                _noop(out[stage])
                stage_times[stage] = round(time.time() - t0, 3)
            total = round(time.time() - t_all0, 3)
            print(json.dumps({"rep": rep, "stages": stage_times, "total": total}), flush=True)
            for df in out.values():
                df.unpersist()
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "catalog"
    if mode == "catalog":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        catalog_mode(tag, sys.argv[3:])
    elif mode == "linkage":
        linkage_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 250_000)
    else:
        raise SystemExit(f"unknown mode {mode}")
