#!/usr/bin/env python
"""Round-6 CC drill-down: build the flagship link graph at bench shape,
then run a timed copy of operators/cc.connected_components round by round."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_pages: int) -> None:
    import math

    from pyspark.sql import functions as F

    from biomedical_el_spark.datagen.pages import generate_pages
    from biomedical_el_spark.operators import pairs as P
    from biomedical_el_spark.operators import scoring as S
    from biomedical_el_spark.operators.cc import (
        _EDGES_PER_PARTITION,
        _is_star_forest,
        _star,
        _symmetrize,
    )
    from biomedical_el_spark.operators.features import band_keys_from_sig, page_features
    from biomedical_el_spark.functions.embedder import hyperplane_lsh_udf
    from biomedical_el_spark.plans.linkage import LinkageConfig
    from biomedical_el_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r06_cc", cores=cpus, shuffle_partitions=2 * cpus)
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
        n_links = links.count()
        print(json.dumps({"n_links": n_links}), flush=True)

        for rep in range(2):
            t_all = time.time()
            t0 = time.time()
            edges = _symmetrize(
                links.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
            ).localCheckpoint()
            t_sym = time.time() - t0
            t0 = time.time()
            n_edges = edges.count()
            t_cnt = time.time() - t0
            sess_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
            rsp = max(8, min(sess_sp, math.ceil(n_edges / _EDGES_PER_PARTITION)))
            spark.conf.set("spark.sql.shuffle.partitions", str(rsp))
            rounds = []
            try:
                for r in range(20):
                    t0 = time.time()
                    edges = _star(_star(edges, large=True, dedup=False), large=False)
                    edges = edges.localCheckpoint()
                    t_star = time.time() - t0
                    t0 = time.time()
                    done = _is_star_forest(edges)
                    t_cert = time.time() - t0
                    rounds.append((round(t_star, 3), round(t_cert, 3)))
                    if done:
                        break
                t0 = time.time()
                comp = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
                roots = comp.select(F.col("component").alias("node"), F.col("component"))
                out = comp.union(roots).groupBy("node").agg(F.min("component").alias("component"))
                out.write.format("noop").mode("overwrite").save()
                t_final = time.time() - t0
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", str(sess_sp))
            print(json.dumps({
                "rep": rep, "n_edges": n_edges, "round_parts": rsp,
                "sym_s": round(t_sym, 3), "count_s": round(t_cnt, 3),
                "rounds": rounds, "final_s": round(t_final, 3),
                "cc_total_s": round(time.time() - t_all, 3),
            }), flush=True)
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 250_000)
