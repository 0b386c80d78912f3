#!/usr/bin/env python
"""Round-6 flagship stage profiler: replicates run_linkage's exact stage
chain (store=None path) but materializes each persisted stage with a noop
sink before building the next, so per-stage wall time is isolated
(guide §1.4).  Numbers feed OPTIMIZATION_r06.md; bench.py stays frozen."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(n_pages: int, reps: int = 2) -> None:
    from pyspark.sql import functions as F

    from biomedical_el_spark.datagen.pages import generate_pages
    from biomedical_el_spark.functions.embedder import hyperplane_lsh_udf
    from biomedical_el_spark.operators import cc as CC
    from biomedical_el_spark.operators import pairs as P
    from biomedical_el_spark.operators import scoring as S
    from biomedical_el_spark.operators.features import band_keys_from_sig, page_features
    from biomedical_el_spark.plans.linkage import LinkageConfig, _estimate_rows
    from biomedical_el_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06_stages", cores=cpus, shuffle_partitions=2 * cpus)
    cfg = LinkageConfig()
    pages_dir = tempfile.mkdtemp(prefix="r06_pages_")
    try:
        generate_pages(spark, n_pages, cluster_size=4).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        for rep in range(reps):
            pages = spark.read.parquet(pages_dir)
            est = _estimate_rows(pages)
            floor = spark.sparkContext.defaultParallelism * 2
            n_part = max(floor, min(est // 50_000, 32 * floor))
            st: dict[str, float] = {}
            t_all = time.time()

            spark.sparkContext.setJobDescription("r06s:features")
            t0 = time.time()
            paged = pages.repartition(n_part, "url")
            features = page_features(
                paged, cfg.num_hashes, cfg.minhash_seed,
                prefix_len=cfg.jw_prefix,
            ).persist()
            _noop(features)
            st["features"] = round(time.time() - t0, 3)

            spark.sparkContext.setJobDescription("r06s:blocks")
            t0 = time.time()
            blk = band_keys_from_sig(features, cfg.bands, cfg.rows_per_band)
            key = hyperplane_lsh_udf(cfg.hyperplanes)(F.col("vec"))
            blk = blk.unionByName(
                features.select(
                    "url", (F.lit(1 << 40) + key.cast("bigint")).alias("block_key")
                )
            )
            blocks = blk.persist()
            _noop(blocks)
            st["blocks"] = round(time.time() - t0, 3)

            spark.sparkContext.setJobDescription("r06s:pairs")
            t0 = time.time()
            cand, _ov = P.candidate_pairs_grouped(
                blocks, cfg.max_block_size,
                escape=cfg.oversized_escape,
                single_exchange=cfg.pairs_single_exchange,
                min_matches=cfg.min_band_matches,
            )
            pairs = cand.persist()
            _noop(pairs)
            st["pairs"] = round(time.time() - t0, 3)

            spark.sparkContext.setJobDescription("r06s:scored")
            t0 = time.time()
            scored = S.score_pairs_from_features(pairs, features, cfg.weights).persist()
            _noop(scored)
            st["scored"] = round(time.time() - t0, 3)

            spark.sparkContext.setJobDescription("r06s:links")
            t0 = time.time()
            links = S.match_links(scored, cfg.tau).persist()
            _noop(links)
            st["links"] = round(time.time() - t0, 3)

            spark.sparkContext.setJobDescription("r06s:clusters")
            t0 = time.time()
            comp = CC.connected_components(links)
            singles = (
                features.select(F.col("url").alias("node"))
                .join(comp, "node", "left_anti")
                .withColumn("component", F.col("node"))
            )
            clusters = comp.unionByName(singles).persist()
            _noop(clusters)
            st["clusters"] = round(time.time() - t0, 3)

            st["total"] = round(time.time() - t_all, 3)
            print(json.dumps({"rep": rep, "stages": st}), flush=True)
            for df in [features, blocks, pairs, scored, links, clusters]:
                df.unpersist()
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 250_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
