#!/usr/bin/env python
"""A/B the CC round-loop shuffle width on the flagship link graph."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_pages: int, widths: list[int]) -> None:
    from pyspark.sql import functions as F

    from biomedical_el_spark.datagen.pages import generate_pages
    from biomedical_el_spark.functions.embedder import hyperplane_lsh_udf
    from biomedical_el_spark.operators import pairs as P
    from biomedical_el_spark.operators import scoring as S
    from biomedical_el_spark.operators.cc import connected_components
    from biomedical_el_spark.operators.features import band_keys_from_sig, page_features
    from biomedical_el_spark.plans.linkage import LinkageConfig
    from biomedical_el_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06_cc_ab", cores=cpus, shuffle_partitions=2 * cpus)
    cfg = LinkageConfig()
    pages_dir = tempfile.mkdtemp(prefix="r06_pages_")
    try:
        generate_pages(spark, n_pages, cluster_size=4).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        paged = pages.repartition(2 * cpus, "url")
        features = page_features(paged, cfg.num_hashes, cfg.minhash_seed,
                                 prefix_len=cfg.jw_prefix).persist()
        blk = band_keys_from_sig(features, cfg.bands, cfg.rows_per_band)
        key = hyperplane_lsh_udf(cfg.hyperplanes)(F.col("vec"))
        blocks = blk.unionByName(
            features.select("url", (F.lit(1 << 40) + key.cast("bigint")).alias("block_key"))
        )
        cand, _ = P.candidate_pairs_grouped(
            blocks, cfg.max_block_size, single_exchange=True)
        links = S.match_links(
            S.score_pairs_from_features(cand, features, cfg.weights), cfg.tau
        ).persist()
        links.count()
        for w in widths:
            times = []
            for _ in range(2):
                t0 = time.time()
                out = connected_components(links, round_shuffle_partitions=w)
                out.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            print(json.dumps({"width": w, "times": times}), flush=True)
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 250_000,
         [int(x) for x in (sys.argv[2:] or ["8", "16", "32", "64", "128"])])
