#!/usr/bin/env python
"""Dump .explain("formatted") for the bench catalog queries plus the
flagship stage DataFrames into plans/r06/<name>_<tag>.txt.

Usage: python tools/r06_dump_plans.py <tag>
Run once at the round-5 baseline commit (tag=before) and once on the
final tree (tag=after); the judge checks plan claims against these."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CATALOG = [
    "er_minhash_blocks", "er_tfidf_blocks", "er_candidate_pairs",
    "er_min2_pairs", "er_capped_star_pairs", "d_near_dup_pairs",
    "er_simhash", "er_fingerprint", "er_ngram_jaccard",
    "ann_cosine_topk", "ann_lsh_topk", "ann_multiprobe_topk",
    "ann_ivf_topk", "ann_ivf_kmeans_topk", "ann_label_top1",
    "w_bio_decode", "w_bio_decode_subword", "cc_customer_nation_region",
    "er_near_dup_clusters",
    "q1_pricing_summary", "q3_order_revenue", "w_running_total",
    "j_interval_overlap",
]


def main(tag: str) -> None:
    from pyspark.sql import functions as F

    from biomedical_el_spark.datagen.pages import generate_pages
    from biomedical_el_spark.plans import catalog
    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage
    from biomedical_el_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06_plans", cores=cpus, shuffle_partitions=cpus)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    def dump(df, name):
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(mode))

    for name in CATALOG:
        dump(catalog.QUERIES[name](spark, sf_dir), name)

    # flagship stages (lazy plans, small page count — plan shape is
    # identical at any corpus size; only partition counts differ)
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * cpus))
    pages_dir = tempfile.mkdtemp(prefix="r06_plan_pages_")
    try:
        generate_pages(spark, 20000, cluster_size=4).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        out = run_linkage(spark, pages, cfg=LinkageConfig())
        for stage in ["features", "blocks", "pairs", "scored", "clusters"]:
            dump(out[stage], f"linkage_{stage}")
        for df in out.values():
            df.unpersist()
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)
    print(f"dumped {len(CATALOG) + 5} plans tag={tag}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "after")
