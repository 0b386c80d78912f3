"""Decompose the weak-curve work_linearity into ALGORITHMIC work growth
vs host per-core slowdown.

The gate-point work_linearity (speed-normalized busy CPU-time per page,
16c/16M vs 4c/4M) measured 2.79x while the Spark-free host envelope's
slow end explains only ~2.1x.  Hypothesis: part of the residual is the
pipeline genuinely doing MORE WORK PER PAGE at larger corpus sizes —
minhash band-key blocks grow as the shingle space saturates (popular
argmin shingles collect linearly more pages until the cap evicts them),
so candidate pairs per page and shuffle bytes per page rise with n even
at fixed code and config.

This probe measures exactly that, with the flagship's own lineage
(page_features -> band_keys_from_sig + hyperplane channel ->
candidate_pairs_grouped at the flagship cap), on the cached scaling
corpora, at full parallelism (counts are deterministic; wall-clock here
is NOT the measurement):

  per corpus size n:
    - band-channel block-size distribution (keys, pages, p50/p99/max)
    - oversized keys (> cap) and pages riding them (dropped work + the
      recall tail already decomposed in BENCH.md)
    - uncapped Sum C(s,2) vs capped pair emissions vs DISTINCT pairs
      (what scoring actually consumes) -- all per page
    - per-stage wall at fixed cores (features / blocks+sizes / pairs),
      a fixed-parallelism n-scaling read on which stage is superlinear

Output: tools/work_growth.json + one human-readable table on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from pyspark.sql import SparkSession, functions as F

from biomedical_el_spark.operators.features import band_keys_from_sig, page_features
from biomedical_el_spark.operators import pairs as P
from biomedical_el_spark.functions.embedder import hyperplane_lsh_udf
from biomedical_el_spark.plans.linkage import LinkageConfig

CORPORA_ROOT = os.environ.get("SCALING_CORPUS_ROOT", "/tmp/scaling_corpora")


def probe_size(spark: SparkSession, path: str, n_pages: int, cfg: LinkageConfig) -> dict:
    pages = spark.read.parquet(path)
    n_part = max(spark.sparkContext.defaultParallelism * 2,
                 min(n_pages // 12500, 32 * spark.sparkContext.defaultParallelism * 2))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))

    t0 = time.time()
    features = page_features(
        pages.repartition(n_part, "url"),
        cfg.num_hashes, cfg.minhash_seed, prefix_len=cfg.jw_prefix,
    ).persist()
    features.count()
    t_features = time.time() - t0

    # the flagship's two live channels (tfidf off by default)
    band = band_keys_from_sig(features, cfg.bands, cfg.rows_per_band)
    key = hyperplane_lsh_udf(cfg.hyperplanes)(F.col("vec"))
    hyper = features.select(
        "url", (F.lit(1 << 40) + key.cast("bigint")).alias("block_key")
    )
    blocks = band.unionByName(hyper).persist()

    t0 = time.time()
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("c"))
    cap = cfg.max_block_size
    stats = sizes.agg(
        F.count("*").alias("keys"),
        F.sum("c").alias("rows"),
        F.sum(F.when(F.col("c") > cap, 1).otherwise(0)).alias("oversized_keys"),
        F.sum(F.when(F.col("c") > cap, F.col("c")).otherwise(0)).alias("oversized_rows"),
        F.sum(
            F.when(F.col("c") <= cap, F.col("c") * (F.col("c") - 1) / 2).otherwise(0)
        ).alias("capped_pair_emissions"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("uncapped_pairs"),
        F.expr("percentile_approx(c, 0.5)").alias("p50"),
        F.expr("percentile_approx(c, 0.99)").alias("p99"),
        F.max("c").alias("max"),
    ).collect()[0].asDict()
    # band channel only (the hyperplane channel is fully capped-out at
    # these sizes; keep its stats separate so the growth signal is clean).
    # Band keys span the full int64 range, so separate structurally (the
    # band DF), not by key namespace.
    band_stats = (
        band.groupBy("block_key").agg(F.count("*").alias("c"))
        .agg(
            F.count("*").alias("band_keys"),
            F.sum(F.when(F.col("c") > cap, F.col("c")).otherwise(0)).alias("band_oversized_rows"),
            F.sum(
                F.when(F.col("c") <= cap, F.col("c") * (F.col("c") - 1) / 2).otherwise(0)
            ).alias("band_capped_pair_emissions"),
            F.expr("percentile_approx(c, 0.99)").alias("band_p99"),
        )
        .collect()[0]
        .asDict()
    )
    t_sizes = time.time() - t0

    t0 = time.time()
    cand, _oversized = P.candidate_pairs_grouped(blocks, cap, escape=None)
    distinct_pairs = cand.count()
    t_pairs = time.time() - t0

    blocks.unpersist()
    features.unpersist()
    out = {
        "n_pages": n_pages,
        "wall_features_s": round(t_features, 1),
        "wall_sizes_s": round(t_sizes, 1),
        "wall_pairs_s": round(t_pairs, 1),
        "distinct_pairs": distinct_pairs,
        "distinct_pairs_per_page": round(distinct_pairs / n_pages, 3),
        "capped_pair_emissions_per_page": round(
            float(stats["capped_pair_emissions"]) / n_pages, 3
        ),
        "uncapped_pairs_per_page": round(float(stats["uncapped_pairs"]) / n_pages, 3),
        "oversized_keys": int(stats["oversized_keys"]),
        "oversized_rows_per_page": round(float(stats["oversized_rows"]) / n_pages, 4),
        "block_keys": int(stats["keys"]),
        "block_p50": float(stats["p50"]),
        "block_p99": float(stats["p99"]),
        "block_max": int(stats["max"]),
        "band": {k: (float(v) if v is not None else None) for k, v in band_stats.items()},
    }
    return out


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1:] or ["1000000", "4000000", "16000000"])]
    cfg = LinkageConfig()
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('PROBE_CPUS', '32')}]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/tmp/spark-local")
        .appName("work_growth_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in sizes:
        path = os.path.join(CORPORA_ROOT, str(n))
        if not os.path.isdir(path):
            print(f"SKIP {n}: corpus not cached at {path}")
            continue
        r = probe_size(spark, path, n, cfg)
        results.append(r)
        print(json.dumps(r))
        # persist incrementally: a crash keeps completed points
        with open(os.path.join(repo, "tools", "work_growth.json"), "w") as f:
            json.dump(results, f, indent=1)
    if len(results) >= 2:
        a, b = results[-2], results[-1]
        g = b["distinct_pairs_per_page"] / max(a["distinct_pairs_per_page"], 1e-9)
        print(
            f"pairs/page growth {a['n_pages']}->{b['n_pages']}: {g:.3f}x "
            f"(capped emissions {b['capped_pair_emissions_per_page'] / max(a['capped_pair_emissions_per_page'], 1e-9):.3f}x)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
