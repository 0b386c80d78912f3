"""The flagship end-to-end linkage pipeline (reference inference path,
SURVEY.md §3.3, restated Spark-first):

    pages ── features (ONE batched Arrow pass: embedding + minhash sig)
        ├── shingle-LSH band keys ──┐
        └── hyperplane LSH buckets ─┴─ candidate pairs (block-size capped,
              oversized reported) → pairwise scoring (cos + sig-jaccard +
              jaro-winkler over narrow feature joins, AQE skew-handled)
              → τ links → large-star/small-star connected components

Each stage commits a snapshot (features, blocks, pairs, scored, links,
clusters + lineage/score metrics) keyed by config+upstream fingerprint;
a killed run resumes from the last committed stage with identical output
(tested: resume == fresh).  On a cluster these are Iceberg tables; the
features table is the one worth bucketing by url.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import metrics as M
from ..functions.embedder import hyperplane_lsh_udf
from ..operators import cc as CC
from ..operators import pairs as P
from ..operators import scoring as S
from ..operators.features import band_keys_from_sig, page_features
from ..sources.snapshots import SnapshotStore, fingerprint


@dataclass
class LinkageConfig:
    """Pipeline semantics + execution knobs.

    Semantic fields are serialized into the snapshot fingerprint, so
    ADDING a semantic field (or changing a default) intentionally
    invalidates pre-change snapshot stores: a resumed run recomputes
    rather than silently mixing outputs from two different pipeline
    definitions.  Execution-only fields (checkpoint_dir, num_partitions)
    are excluded and never invalidate.
    """
    num_hashes: int = 32
    bands: int = 16
    rows_per_band: int = 2
    minhash_seed: int = 42
    use_embedding_blocks: bool = True
    hyperplanes: int = 12
    # scale the hyperplane count with the corpus (max(hyperplanes,
    # ceil(log2(rows/16))) capped at 24, ~16 pages/bucket at any size —
    # the LSH analogue of nlist ∝ n in IVF; the RESOLVED plane count
    # enters the snapshot fingerprint).  Default OFF by measurement
    # (tools/capscale_ab.py, 1M pages): on THIS corpus the band channel
    # already covers what the embedding channel can reach — auto
    # capacity bought +0.0001 recall for +16% wall.  Enable for corpora
    # with cross-format near-dups (low Jaccard, high cosine), where a
    # fixed 2^12-bucket channel is dead after capping at >=1M pages.
    auto_hyperplanes: bool = False
    use_tfidf_blocks: bool = False
    tfidf_top_w: int = 2
    max_block_size: int = 64
    # what to do with blocks over the cap: "star" pairs every member
    # with the block's min url — O(b) pairs whose τ-scoring plus
    # transitive closure can recover an evicted duplicate group; None
    # (default) excludes them.  Default OFF by measurement
    # (tools/capscale_ab.py, 1M pages): cap eviction costs only 0.76%
    # of gold pairs there (2.0% more are banding misses that share NO
    # key), and star recovered ~none of them (+0.000 recall for +34%
    # wall — oversized blocks on this corpus are boilerplate key
    # collisions, not duplicate groups, so hub edges fail τ).  Enable
    # for corpora where hot blocks ARE duplicate blobs (mirrors,
    # parked-domain farms) — the unit tests construct that shape.
    oversized_escape: str | None = None
    # evidence-count gate at pair dedup: keep only candidate pairs that
    # collide in >= this many DISTINCT blocks (bands / embedding buckets /
    # tfidf keys all count).  Rides the groupBy exchange that distinct()
    # already pays — zero extra shuffle.  SEMANTIC knob (changes the
    # candidate set, hence recall): default 1 = today's any-single-block
    # behavior; 2 suppresses low-similarity junk multiplicatively where
    # rows_per_band+1 would also tax true pairs.  Measured tradeoff
    # (recall / junk-pair volume / wall) in tools/banding_ab.json and
    # BENCH.md.  Star-escape hub pairs are exempt (their evidence is one
    # oversized block by construction).
    min_band_matches: int = 1
    tau: float = 0.62
    jw_prefix: int = 32
    weights: dict = field(default_factory=lambda: dict(S.DEFAULT_WEIGHTS))
    # NFD accent-strip before key derivation (blocking + JW prefix) — for
    # non-English corpora where 'café' appears in both NFC and NFD
    normalize_accents: bool = False
    # reliable CC checkpoint dir (HDFS/object store on a cluster);
    # None = localCheckpoint (local-mode speed, not executor-loss safe)
    checkpoint_dir: str | None = None
    # partition count for the CPU-bound feature stage (and the session's
    # shuffle width follows it on big corpora): None = data-proportional,
    # ~TASK_PAGES pages per task floored at 2×parallelism.  Tasks stay
    # minutes-bounded as the corpus grows — a fixed 2×cores width at 16M+
    # pages makes every task a multi-minute straggler target and loses
    # the multi-wave balancing that absorbs slow cores (A/B: 16c/16M
    # went 1561s → see BENCH.md once sized by data).  Execution detail,
    # excluded from the snapshot fingerprint.
    num_partitions: int | None = None
    # pair-gen physical-plan knob: block sizes as count-over-window and
    # collect_list on ONE hash exchange of the block relation instead of
    # shuffling it twice (singletons and oversized keys filtered before
    # any agg state).  Identical results either way; execution detail,
    # excluded from the snapshot fingerprint.  Default ON by measurement
    # (tools/conf_ab.py, same-window pairs): 16c/16M gate leg 1257.3 s
    # vs 1378.4 s two-pass (−8.8%, despite the single-exchange leg
    # drawing the noisier spin window), 16c/1M −3.9% and −7.3%.
    pairs_single_exchange: bool = True


# target pages per feature-stage task: ~10-15s of Arrow UDF work — small
# enough for wave balancing, large enough to amortize batch setup
TASK_PAGES = 50_000


def _estimate_rows(pages: DataFrame, sample_files: int = 64) -> int:
    """Upper-bound row estimate from parquet FOOTERS — pure metadata, no
    Spark job, no lineage execution.  (A `count()` here is a real
    aggregate job: for a bare scan it's one pass over the input, and for
    a UDF-heavy upstream it runs the whole lineage once before the
    feature stage even starts.)  Returns 0 (caller falls back to
    2×parallelism) when the plan isn't a local parquet file scan.  For
    huge file lists only `sample_files` footers are read, evenly spaced,
    and the total is extrapolated — partition sizing needs magnitude,
    not exactness."""
    try:
        files = [f for f in pages.inputFiles() if f.endswith(".parquet")]
        if not files:
            return 0
        import pyarrow.parquet as pq
        from urllib.parse import urlparse

        paths = []
        for f in files:
            u = urlparse(f)
            if u.scheme not in ("", "file"):
                # remote FS (hdfs/s3/...): footers aren't reachable from
                # the driver without extra deps, but the scan's catalyst
                # statistics (file-size sum, still metadata-only) are.
                # Rows ~ bytes/1KB assumes >=1 KB per compressed page;
                # overestimating rows only ADDS partitions — the safe
                # direction (the alternative, est=0, silently reverts to
                # the fixed 2x-parallelism width that round 3 measured
                # as the 16M-page straggler bug).
                size = int(
                    pages._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                )
                if 0 < size < 10**15:  # guard the "unknown" sentinel
                    return size // 1024
                return 0
            paths.append(u.path)
        step = max(1, len(paths) // sample_files)
        sampled = paths[::step]
        rows = sum(pq.ParquetFile(p).metadata.num_rows for p in sampled)
        return int(rows * len(paths) / len(sampled))
    except Exception:
        return 0


def resolved_config(cfg: LinkageConfig, est: int) -> dict:
    """The SEMANTIC config dict that keys snapshots: execution-only
    fields dropped, data-proportional knobs resolved against the row
    estimate (the resolved values are the semantics — two corpora of
    different sizes legitimately get different fingerprints; their input
    fingerprints differ anyway)."""
    hp = cfg.hyperplanes
    if cfg.auto_hyperplanes and est > 16:
        import math

        # ~16 pages per embedding bucket at any corpus size
        hp = max(hp, min(24, math.ceil(math.log2(est / 16))))
    cfg_dict = asdict(cfg)
    cfg_dict.pop("checkpoint_dir")
    cfg_dict.pop("num_partitions")
    cfg_dict.pop("pairs_single_exchange")
    cfg_dict["hyperplanes"] = hp
    # storage encoding of the features stage (int8 vec / int32 sig since
    # r5): part of the semantics — a pre-change snapshot store must not
    # be silently mixed with post-change stages
    cfg_dict["features_schema"] = "q8s32"
    return cfg_dict


def run_linkage(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore | None = None,
    cfg: LinkageConfig | None = None,
    input_fingerprint: str = "",
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns all stage DataFrames."""
    cfg = cfg or LinkageConfig()
    assert cfg.bands * cfg.rows_per_band == cfg.num_hashes
    # footer-based row estimate: metadata-only, never executes the lineage
    est = _estimate_rows(pages)
    cfg_dict = resolved_config(cfg, est)
    hp = cfg_dict["hyperplanes"]
    cfg_fp = fingerprint(cfg_dict, input_fingerprint)

    def snap(stage: str, compute, partition_by=None) -> DataFrame:
        if store is None:
            # no snapshot dir: cache stage outputs so downstream stages and
            # metrics don't recompute the whole upstream pipeline
            return compute().persist()
        return store.get_or_compute(spark, stage, cfg_fp, compute, partition_by)

    # Explicit repartition before the feature UDF: parquet split packing
    # can hand a small corpus to a handful of tasks; the CPU-bound encoder
    # stage must fan out to the full parallelism (SURVEY.md §4.3) AND
    # stay wave-balanced on big corpora (see num_partitions).  On a
    # cluster this is repartition(N, "url") against bucketed Iceberg.
    n_part = cfg.num_partitions
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    widened = False
    if n_part is None:
        floor = spark.sparkContext.defaultParallelism * 2
        n_part = max(floor, min(est // TASK_PAGES, 32 * floor))
        # widen shuffles to match: pair-gen/scoring move similar volume
        if n_part > floor:
            spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
            widened = True
    paged = pages.repartition(n_part, "url")
    features = snap(
        "features",
        lambda: page_features(
            paged,
            cfg.num_hashes,
            cfg.minhash_seed,
            prefix_len=cfg.jw_prefix,
            normalize_accents=cfg.normalize_accents,
        ),
    )

    def compute_blocks() -> DataFrame:
        blk = band_keys_from_sig(features, cfg.bands, cfg.rows_per_band)
        if cfg.use_embedding_blocks:
            key = hyperplane_lsh_udf(hp)(F.col("vec"))
            # shift hyperplane buckets into their own bigint key space
            blk = blk.unionByName(
                features.select(
                    "url",
                    (F.lit(1 << 40) + key.cast("bigint")).alias("block_key"),
                )
            )
        if cfg.use_tfidf_blocks:
            # third recall channel (reference --use_tfidf_candidates):
            # rare-shingle keys catch low-Jaccard pairs that share one
            # distinctive phrase.  Hashed into their own key namespace —
            # a 64-bit collision can only ADD a candidate pair.
            # Deliberately the TEXT-based channel: the round-4
            # shared-shingle variant (emit_shingles=True +
            # tfidf_blocks_from_features) was A/B'd at 1M pages and
            # measured WORSE (+117% wall vs +69% for this path) — the
            # Arrow-pass shingle emission and the widened persisted
            # features relation cost more than the JVM re-tokenization
            # they save; both operators remain available and tested.
            from ..operators.blocking import tfidf_blocks

            tf = tfidf_blocks(paged, top_w=cfg.tfidf_top_w)
            blk = blk.unionByName(
                tf.select(
                    "url",
                    F.xxhash64(F.lit("tfidf"), F.col("block_key")).alias("block_key"),
                )
            )
        return blk

    blocks = snap("blocks", compute_blocks)

    def compute_pairs() -> DataFrame:
        cand, oversized = P.candidate_pairs_grouped(
            blocks,
            cfg.max_block_size,
            escape=cfg.oversized_escape,
            single_exchange=cfg.pairs_single_exchange,
            min_matches=cfg.min_band_matches,
        )
        if store is not None:
            store.write(oversized, "oversized_blocks", cfg_fp)  # never silent
        return cand

    pairs = snap("pairs", compute_pairs)

    scored = snap(
        "scored",
        lambda: S.score_pairs_from_features(pairs, features, cfg.weights),
    )
    if store is not None:
        # commit-once like every stage: a resumed run must not re-scan
        # the scored snapshot just to rewrite identical metric tables
        if not store.committed("metrics_score_hist", cfg_fp):
            store.write(M.score_histogram(scored), "metrics_score_hist", cfg_fp)
        if not store.committed("metrics_lineage", cfg_fp):
            store.write(
                M.partition_lineage(scored, "scored"), "metrics_lineage", cfg_fp
            )

    links = snap("links", lambda: S.match_links(scored, cfg.tau))

    def compute_clusters() -> DataFrame:
        comp = CC.connected_components(links, checkpoint_dir=cfg.checkpoint_dir)
        # union singleton pages back in as their own cluster; node ids
        # come from the (cached/snapshotted, narrow) features table — 1:1
        # with pages, avoids re-scanning the wide pages relation
        singles = (
            features.select(F.col("url").alias("node"))
            .join(comp, "node", "left_anti")
            .withColumn("component", F.col("node"))
        )
        return comp.unionByName(singles)

    clusters = snap("clusters", compute_clusters)
    # Eager path (snapshot store): every stage is already materialized,
    # so restore the session shuffle width instead of leaking the widened
    # setting into whatever the caller runs next.  Lazy path (store=None,
    # stages persist()ed but not yet computed): the width must stay until
    # the caller materializes them, so it is intentionally left in place.
    if widened and store is not None:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    return {
        "features": features,
        "blocks": blocks,
        "pairs": pairs,
        "scored": scored,
        "links": links,
        "clusters": clusters,
    }
