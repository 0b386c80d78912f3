"""The flagship end-to-end linkage pipeline (reference inference path,
SURVEY.md §3.3, restated Spark-first):

    pages ─┬─ shingle MinHash-LSH blocks ──┐
           └─ embedding hyperplane blocks ─┴─ candidate pairs
                 → hybrid pairwise scoring → τ links
                 → large-star/small-star connected components → clusters

Each stage commits a snapshot (blocks, pairs, scored, links, clusters,
plus lineage/score metrics) keyed by a config+upstream fingerprint, so a
killed run resumes from the last committed stage with identical output
(tested: resume == fresh run).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import metrics as M
from ..operators import blocking as B
from ..operators import cc as CC
from ..operators import pairs as P
from ..operators import scoring as S
from ..sources.snapshots import SnapshotStore, fingerprint


@dataclass
class LinkageConfig:
    k_shingle: int = 3
    num_hashes: int = 32
    bands: int = 16
    rows_per_band: int = 2
    use_embedding_blocks: bool = True
    hyperplanes: int = 12
    max_block_size: int = 64
    salt_buckets: int = 8
    tau: float = 0.62
    weights: dict = field(default_factory=lambda: dict(S.DEFAULT_WEIGHTS))


def run_linkage(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore | None = None,
    cfg: LinkageConfig | None = None,
    input_fingerprint: str = "",
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns all stage DataFrames."""
    cfg = cfg or LinkageConfig()
    cfg_fp = fingerprint(asdict(cfg), input_fingerprint)

    def snap(stage: str, compute, partition_by=None) -> DataFrame:
        if store is None:
            # no snapshot dir: cache stage outputs so downstream stages and
            # metrics don't recompute the whole upstream pipeline
            return compute().persist()
        return store.get_or_compute(spark, stage, cfg_fp, compute, partition_by)

    def compute_blocks() -> DataFrame:
        blk = B.shingle_blocks(
            pages, cfg.k_shingle, cfg.num_hashes, cfg.bands, cfg.rows_per_band
        )
        if cfg.use_embedding_blocks:
            blk = blk.unionByName(B.embedding_blocks(pages, cfg.hyperplanes))
        return blk

    blocks = snap("blocks", compute_blocks)

    def compute_pairs() -> DataFrame:
        cand, oversized = P.candidate_pairs(blocks, cfg.max_block_size)
        if store is not None:
            store.write(oversized, "oversized_blocks", cfg_fp)  # never silent
        return cand

    pairs = snap("pairs", compute_pairs)

    def compute_scored() -> DataFrame:
        return S.score_pairs(
            pairs, pages, cfg.weights, cfg.salt_buckets, cfg.k_shingle
        )

    scored = snap("scored", compute_scored)
    if store is not None:
        store.write(M.score_histogram(scored), "metrics_score_hist", cfg_fp)
        store.write(M.partition_lineage(scored, "scored"), "metrics_lineage", cfg_fp)

    links = snap("links", lambda: S.match_links(scored, cfg.tau))

    def compute_clusters() -> DataFrame:
        comp = CC.connected_components(links)
        # union singleton pages back in as their own cluster
        singles = (
            pages.select(F.col("url").alias("node"))
            .join(comp, "node", "left_anti")
            .withColumn("component", F.col("node"))
        )
        return comp.unionByName(singles)

    clusters = snap("clusters", compute_clusters)
    return {
        "blocks": blocks,
        "pairs": pairs,
        "scored": scored,
        "links": links,
        "clusters": clusters,
    }
