"""Incremental blocking over a stream of new pages.

The reference has no streaming (SURVEY.md §2.9); this is the natural
extension the north_star sketches: new Common-Crawl snapshots arrive,
each micro-batch is featurized with the SAME batched UDFs as the batch
pipeline (one code path → the byte-identical text invariant holds across
batch and stream), band keys are appended to the blocks store, and new
candidate pairs are emitted by joining the micro-batch's keys against
the accumulated key store — incremental ER without recomputing old
blocks.

Store layout is BUCKET-FIRST (`bucket=<b>/batch_id=<n>`): the per-batch
accumulated join reads only the bucket directories the batch's keys can
possibly match, so listing + rows-read scale with the batch's key
coverage, not with how many batches the store has accumulated (the
batch-first layout had to list every batch directory to prune).  On a
cluster the store is an Iceberg table with a bloom filter on block_key;
explicit bucket-directory selection is the local-parquet equivalent.

Pairs are exactly-once ACROSS batches, not just per batch partition: a
re-crawled url in a later micro-batch regenerates pairs an earlier batch
already committed, so new pairs are anti-joined against the committed
pairs store (pruned to the same pair-hash buckets) before writing.

`compact_blocks_store` merges a bucket's many small per-batch files into
one `batch_id=-1` partition — the local-mode analogue of Iceberg
`rewrite_data_files`; run it between triggers.

Also provides the watermarked windowed ingest-rate aggregation
(`pages_per_window`) — the standard late-data-tolerant stream metric.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.features import band_keys_from_sig, page_features
from ..sources.pages import PAGES_SCHEMA

COMPACTED_BATCH_ID = -1


def read_page_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-source stream of page parquet drops (one file = one crawl
    shard).  On a cluster this is Kafka/Iceberg-incremental instead."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def read_store_buckets(
    spark: SparkSession, store: str, buckets: list[int], col: str = "bucket"
) -> DataFrame | None:
    """Read ONLY the given bucket directories of a bucket-first store.

    Explicit directory selection instead of a `.filter(bucket.isin(...))`
    on the full store: pruning is then guaranteed by construction (and
    directly testable as rows-read), not dependent on Catalyst partition
    pruning, and the file listing never touches uncovered buckets.
    Returns None when none of the buckets exist yet (empty store)."""
    paths = [f"{store}/{col}={b}" for b in sorted(set(buckets))]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return None
    return spark.read.option("basePath", store).parquet(*paths)


def process_block_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    bands: int = 16,
    rows_per_band: int = 2,
    num_hashes: int = 32,
    n_buckets: int = 64,
    feats: DataFrame | None = None,
) -> None:
    """One micro-batch of incremental blocking.  Module-level (not a
    closure) so idempotency is directly testable: calling it twice with
    the same batch_id must leave the store unchanged.

    Idempotency: outputs are partitioned `bucket/batch_id` and written
    with DYNAMIC partition overwrite — a retried micro-batch REPLACES its
    own (bucket, batch_id) leaves instead of appending duplicates.
    Features are deterministic, so a retry covers the same buckets.

    Exactly-once pairs: new pairs are anti-joined against pairs already
    committed by EARLIER batches (own batch_id excluded, so a retry that
    half-wrote its partition still re-emits its own pairs) before
    writing.  The committed-pairs read is pruned to the new pairs'
    pair-hash buckets, so this check also scales with the batch, not the
    corpus.
    """
    spark = batch_df.sparkSession
    if feats is None:
        feats = page_features(batch_df, num_hashes=num_hashes)
    keys = (
        band_keys_from_sig(feats, bands, rows_per_band)
        .withColumn("bucket", F.pmod(F.col("block_key"), F.lit(n_buckets)).cast("int"))
        .persist()
    )
    (
        keys.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket", "batch_id")
        .parquet(f"{store_dir}/blocks")
    )
    # incremental pairs: this batch's keys × accumulated keys, reading
    # only the store buckets this batch can possibly match.  The bucket
    # list is bounded by n_buckets (a collect of ≤64 ints, not data).
    buckets = [r["bucket"] for r in keys.select("bucket").distinct().collect()]
    acc = read_store_buckets(spark, f"{store_dir}/blocks", buckets)
    if acc is None:  # empty micro-batch: nothing to pair
        keys.unpersist()
        return
    new_pairs = (
        keys.withColumnRenamed("url", "url_a")
        .join(acc.withColumnRenamed("url", "url_b"), "block_key")
        .filter(F.col("url_a") != F.col("url_b"))
        .select(
            F.least("url_a", "url_b").alias("url_a"),
            F.greatest("url_a", "url_b").alias("url_b"),
        )
        .distinct()
        .withColumn(
            "pbucket",
            F.pmod(F.xxhash64("url_a", "url_b"), F.lit(n_buckets)).cast("int"),
        )
        .persist()  # read twice: bucket list, then the anti-join + write
    )
    pair_buckets = [r["pbucket"] for r in new_pairs.select("pbucket").distinct().collect()]
    prev = read_store_buckets(spark, f"{store_dir}/pairs", pair_buckets, col="pbucket")
    out_pairs = new_pairs
    if prev is not None:
        committed = prev.filter(F.col("batch_id") != batch_id).select(
            "url_a", "url_b"
        )
        out_pairs = new_pairs.join(committed, ["url_a", "url_b"], "left_anti")
    (
        out_pairs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pbucket", "batch_id")
        .parquet(f"{store_dir}/pairs")
    )
    new_pairs.unpersist()
    keys.unpersist()


def committed_batch_ids(checkpoint_dir: str) -> set[int]:
    """Batch ids the streaming checkpoint has COMMITTED (one file per id
    under `commits/`) — the only batches whose store leaves are safe to
    rewrite: an id without a commit marker may re-run and rewrite its
    own (bucket, batch_id) leaves."""
    commits = os.path.join(checkpoint_dir, "commits")
    ids: set[int] = set()
    if os.path.isdir(commits):
        for name in os.listdir(commits):
            if name.isdigit():
                ids.add(int(name))
    return ids


def compact_blocks_store(
    spark: SparkSession,
    store_dir: str,
    n_buckets: int = 64,
    checkpoint_dir: str | None = None,
) -> None:
    """Merge accumulated per-batch files into a single `batch_id=-1`
    partition per bucket (one file per bucket) — the local-parquet
    analogue of Iceberg `rewrite_data_files`.

    Run BETWEEN triggers (it is a maintenance op, not part of a batch):
    the rewrite-then-swap is not atomic on a local filesystem, so it must
    not race the stream; on a cluster use a table format with atomic
    commit instead.

    checkpoint_dir given (recommended): only leaves whose batch_id is
    recorded as committed in the streaming checkpoint (plus previous
    compactions) are absorbed; leaves of uncommitted batches — e.g. the
    half-written output of a batch that crashed before its commit marker
    — are carried over UNTOUCHED, so the retry's dynamic overwrite
    replaces them instead of duplicating rows the compaction had already
    absorbed.  checkpoint_dir=None absorbs everything and is only safe
    while the stream is healthy between triggers (no crashed,
    uncommitted batch output on disk).
    """
    base = f"{store_dir}/blocks"
    if not os.path.isdir(base):
        return
    leaves: list[tuple[str, int, str]] = []  # (bucket_dir_name, batch_id, leaf_path)
    for bdir in sorted(os.listdir(base)):
        if not bdir.startswith("bucket="):
            continue
        for leaf in sorted(os.listdir(os.path.join(base, bdir))):
            if leaf.startswith("batch_id="):
                leaves.append(
                    (bdir, int(leaf.split("=", 1)[1]), os.path.join(base, bdir, leaf))
                )
    if checkpoint_dir is not None:
        safe = committed_batch_ids(checkpoint_dir) | {COMPACTED_BATCH_ID}
        absorb = [p for _, b, p in leaves if b in safe]
        carry = [(d, b) for d, b, p in leaves if b not in safe]
    else:
        absorb = [p for _, _, p in leaves]
        carry = []
    if not absorb:
        return
    tmp = f"{store_dir}/blocks_compacting"
    old = f"{store_dir}/blocks_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    (
        spark.read.option("basePath", base)
        .parquet(*absorb)
        .withColumn("batch_id", F.lit(COMPACTED_BATCH_ID))
        .repartition(n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket", "batch_id")
        .parquet(tmp)
    )
    # carry uncommitted leaves over physically, untouched
    for bdir, b in carry:
        dst = os.path.join(tmp, bdir, f"batch_id={b}")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(os.path.join(base, bdir, f"batch_id={b}"), dst)
    os.rename(base, old)
    os.rename(tmp, base)
    shutil.rmtree(old, ignore_errors=True)


CLUSTERS = "clusters"
CLUSTERS_MIRROR = "clusters_by_comp"


def _journal_path(store_dir: str) -> str:
    return os.path.join(store_dir, "clusters_commit.json")


def _write_journal(store_dir: str, spec: dict) -> None:
    """Write-ahead intent log for the multi-bucket swap, made visible in
    one atomic rename — the commit point.  Before it exists, only
    staging dirs were touched; after, roll-forward completes the swap."""
    tmp = _journal_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, _journal_path(store_dir))


def _commit_swaps(store_dir: str, spec: dict, fail_after: int | None = None) -> None:
    """Apply a journaled bucket swap: for each store, rename staged
    bucket dirs into place and drop buckets the update emptied.  Every
    step is idempotent (src-missing ⇒ already swapped; rmtree tolerates
    absence), so re-running after a crash at ANY point completes the
    same commit.  `fail_after` (tests only) raises after N bucket
    renames to simulate a crash mid-swap."""
    done = 0
    for sw in spec["swaps"]:
        base = os.path.join(store_dir, sw["store"])
        staging = os.path.join(store_dir, sw["store"] + "_staging")
        os.makedirs(base, exist_ok=True)
        for b in sw["swap"]:
            src = os.path.join(staging, f"{sw['col']}={b}")
            dst = os.path.join(base, f"{sw['col']}={b}")
            if os.path.isdir(src):
                shutil.rmtree(dst, ignore_errors=True)
                os.rename(src, dst)
                done += 1
                if fail_after is not None and done >= fail_after:
                    raise RuntimeError("injected crash mid-swap (test)")
        for b in sw.get("drop", []):
            shutil.rmtree(os.path.join(base, f"{sw['col']}={b}"), ignore_errors=True)
    for sw in spec["swaps"]:
        shutil.rmtree(
            os.path.join(store_dir, sw["store"] + "_staging"), ignore_errors=True
        )
    os.remove(_journal_path(store_dir))


def _recover_clusters(store_dir: str) -> None:
    """Roll forward (or discard) an interrupted clusters commit.  Journal
    present ⇒ the commit point passed: complete the swap so the mapping
    is never observed partially applied (the pre-round-5 dynamic
    overwrite could crash mid-way and leave a permanently split cluster
    when the replay's lifted edges all collapsed to src==dst).  No
    journal ⇒ any staging dirs are pre-commit garbage from a crashed
    write; remove them."""
    j = _journal_path(store_dir)
    if os.path.exists(j):
        with open(j) as f:
            spec = json.load(f)
        _commit_swaps(store_dir, spec)
        return
    for s in (CLUSTERS, CLUSTERS_MIRROR):
        shutil.rmtree(os.path.join(store_dir, s + "_staging"), ignore_errors=True)


def _staged_buckets(staging: str, col: str) -> list[int]:
    if not os.path.isdir(staging):
        return []
    return [
        int(d.split("=", 1)[1])
        for d in os.listdir(staging)
        if d.startswith(f"{col}=")
    ]


def _update_clusters(
    spark: SparkSession, store_dir: str, links: DataFrame, n_buckets: int
) -> None:
    """Incremental connected-components maintenance over the clusters
    store (`clusters/nbucket=<pmod(xxhash64(node))>` → (node, component),
    component = min node id of the cluster — the batch pipeline's id
    convention, so incremental and batch agree exactly) plus a
    component-keyed mirror (`clusters_by_comp/cbucket=
    <pmod(xxhash64(component))>`, same rows) so EVERY per-batch read is
    bucket-pruned: the link-endpoint lift reads only the nbuckets the
    batch's urls hash into, and the members-of-merged-components lookup
    reads only the cbuckets of the components the batch actually merges
    — no corpus-linear scan anywhere in the batch path.

    Crash consistency: both stores are updated through ONE staged,
    journaled, idempotent bucket swap (`_write_journal`/`_commit_swaps`,
    rolled forward by `_recover_clusters` at entry).  A crash before the
    journal rename leaves the old mapping fully intact (replay
    recomputes identically); a crash after it is completed by roll-
    forward before the replay lifts anything — a partially-applied
    mapping is never observable, which is what makes the empty-
    comp_edges early return safe.  On a cluster this journal is exactly
    the atomic multi-partition snapshot commit Iceberg provides
    natively.  Component ids are global min node ids, independent of
    merge order, so replaying a batch's links is always convergent."""
    from ..operators.cc import connected_components

    _recover_clusters(store_dir)
    base = os.path.join(store_dir, CLUSTERS)
    mirror = os.path.join(store_dir, CLUSTERS_MIRROR)
    # the swap renames files OUTSIDE Spark — drop any cached file
    # listing for both stores before reading them
    spark.catalog.refreshByPath(base)
    spark.catalog.refreshByPath(mirror)
    have_old = os.path.isdir(base)
    if have_old and not os.path.isdir(mirror):
        # one-time backfill for stores created before the mirror existed;
        # single os.rename makes it atomic (partial build never visible)
        tmp = mirror + "_backfill"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            spark.read.parquet(base)
            .select("node", "component")
            .withColumn(
                "cbucket",
                F.pmod(F.xxhash64("component"), F.lit(n_buckets)).cast("int"),
            )
            .repartition(n_buckets, "cbucket")
            .write.partitionBy("cbucket")
            .parquet(tmp)
        )
        os.rename(tmp, mirror)

    li = links.select("url_a", "url_b").distinct().persist()
    link_nodes = (
        li.select(F.col("url_a").alias("node"))
        .union(li.select(F.col("url_b").alias("node")))
        .distinct()
        .persist()
    )
    # lift reads ONLY the nbuckets the batch's endpoints hash into
    # (bounded collect: ≤ n_buckets ints)
    node_buckets = [
        r["b"]
        for r in link_nodes.select(
            F.pmod(F.xxhash64("node"), F.lit(n_buckets)).cast("int").alias("b")
        ).distinct().collect()
    ]
    old = (
        read_store_buckets(spark, base, node_buckets, col="nbucket")
        if have_old
        else None
    )
    if old is not None:
        old = old.select("node", "component")
        ca = old.select(F.col("node").alias("url_a"), F.col("component").alias("ca"))
        cb = old.select(F.col("node").alias("url_b"), F.col("component").alias("cb"))
        lifted = (
            li.join(ca, "url_a", "left")
            .join(cb, "url_b", "left")
            .select(
                F.coalesce("ca", "url_a").alias("src"),
                F.coalesce("cb", "url_b").alias("dst"),
            )
        )
    else:
        lifted = li.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
    comp_edges = lifted.filter(F.col("src") != F.col("dst")).distinct().persist()
    if comp_edges.limit(1).count() == 0:
        # safe: recovery above guarantees the mapping these edges were
        # lifted through is a fully-committed one
        for df in (li, link_nodes, comp_edges):
            df.unpersist()
        return
    comp_cc = connected_components(
        comp_edges, src_col="src", dst_col="dst"
    ).persist()  # (node = old component id or new node, component = new id)

    if old is not None:
        new_nodes = link_nodes.join(old, "node", "left_anti")
        changed = comp_cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("component"), F.col("component").alias("newc")
        ).persist()
        # members of merged components: read ONLY their cbuckets from the
        # component-keyed mirror (bounded collect: ≤ n_buckets ints)
        chg_cbuckets = [
            r["b"]
            for r in changed.select(
                F.pmod(F.xxhash64("component"), F.lit(n_buckets))
                .cast("int")
                .alias("b")
            ).distinct().collect()
        ]
        members = read_store_buckets(spark, mirror, chg_cbuckets, col="cbucket")
        affected_old = (
            members.select("node", "component").join(changed, "component").select(
                "node", F.col("newc").alias("component")
            )
            if members is not None
            else None
        )
    else:
        new_nodes = link_nodes
        changed = None
        affected_old = None
    new_rows = new_nodes.join(comp_cc, "node", "left").select(
        F.col("node"), F.coalesce("component", "node").alias("component")
    )
    updates = (
        new_rows if affected_old is None else affected_old.unionByName(new_rows)
    ).withColumn(
        "nbucket", F.pmod(F.xxhash64("node"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "cbucket", F.pmod(F.xxhash64("component"), F.lit(n_buckets)).cast("int")
    ).persist()

    # ---- stage the node-keyed store ----
    upd_buckets = [r["nbucket"] for r in updates.select("nbucket").distinct().collect()]
    node_staging = base + "_staging"
    shutil.rmtree(node_staging, ignore_errors=True)
    current = read_store_buckets(spark, base, upd_buckets, col="nbucket")
    node_out = updates.select("node", "component", "nbucket")
    if current is not None:
        keep = current.join(updates.select("node"), "node", "left_anti").select(
            "node", "component", "nbucket"
        )
        node_out = keep.unionByName(node_out)
    (
        node_out.repartition(max(1, len(upd_buckets)), "nbucket")
        .write.partitionBy("nbucket")
        .parquet(node_staging)
    )

    # ---- stage the component-keyed mirror ----
    # affected cbuckets: where updated rows LAND (their new component)
    # plus where members of merged components CURRENTLY sit (old comp)
    aff_c = updates.select("cbucket")
    if changed is not None:
        aff_c = aff_c.union(
            changed.select(
                F.pmod(F.xxhash64("component"), F.lit(n_buckets))
                .cast("int")
                .alias("cbucket")
            )
        )
    aff_cbuckets = [r["cbucket"] for r in aff_c.distinct().collect()]
    mirror_staging = mirror + "_staging"
    shutil.rmtree(mirror_staging, ignore_errors=True)
    mcurrent = read_store_buckets(spark, mirror, aff_cbuckets, col="cbucket")
    mirror_out = updates.select("node", "component", "cbucket")
    if mcurrent is not None:
        mkeep = mcurrent.join(updates.select("node"), "node", "left_anti").select(
            "node", "component", "cbucket"
        )
        mirror_out = mkeep.unionByName(mirror_out)
    (
        mirror_out.repartition(max(1, len(aff_cbuckets)), "cbucket")
        .write.partitionBy("cbucket")
        .parquet(mirror_staging)
    )

    # ---- journal + atomic-equivalent swap of BOTH stores ----
    # a cbucket whose rows ALL moved elsewhere produces no staging dir;
    # it must be dropped, not left stale
    mirror_staged = _staged_buckets(mirror_staging, "cbucket")
    spec = {
        "swaps": [
            {"store": CLUSTERS, "col": "nbucket", "swap": upd_buckets, "drop": []},
            {
                "store": CLUSTERS_MIRROR,
                "col": "cbucket",
                "swap": mirror_staged,
                "drop": sorted(set(aff_cbuckets) - set(mirror_staged)),
            },
        ]
    }
    _write_journal(store_dir, spec)
    _commit_swaps(store_dir, spec)
    spark.catalog.refreshByPath(base)
    spark.catalog.refreshByPath(mirror)
    for df in (li, link_nodes, comp_edges, comp_cc, updates):
        df.unpersist()
    if changed is not None:
        changed.unpersist()


def read_clusters(spark: SparkSession, store_dir: str) -> DataFrame:
    """(node, component) for every ingested page: the maintained mapping
    for linked nodes, singletons (their own component) derived from the
    features store — same contract as the batch pipeline's clusters
    output.  Rolls forward any interrupted clusters commit first, so a
    reader never observes a partially-swapped mapping."""
    _recover_clusters(store_dir)
    base = f"{store_dir}/clusters"
    spark.catalog.refreshByPath(base)
    feats = spark.read.parquet(f"{store_dir}/features").select("url").distinct()
    if not os.path.isdir(base):
        return feats.select(
            F.col("url").alias("node"), F.col("url").alias("component")
        )
    mapped = spark.read.parquet(base).select("node", "component")
    singles = (
        feats.select(F.col("url").alias("node"))
        .join(mapped, "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return mapped.unionByName(singles)


def process_linkage_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    bands: int = 16,
    rows_per_band: int = 2,
    num_hashes: int = 32,
    n_buckets: int = 64,
    tau: float = 0.62,
    weights: dict | None = None,
    # matches LinkageConfig.jw_prefix's default so stream==batch holds
    # under DEFAULT configs, not just in the test's explicit pairing
    prefix_len: int = 32,
) -> None:
    """The FULL flagship per micro-batch: features → incremental blocking
    → exactly-once new candidate pairs (process_block_batch) → fused
    scoring of the new pairs (same Arrow kernels as batch) → τ links →
    incremental cluster maintenance (_update_clusters).  An arriving
    micro-batch therefore updates `clusters`, not just candidate pairs —
    the streaming pipeline ends where the batch pipeline ends.

    Stores (all bucket-first, dynamic-overwrite idempotent):
      features/fbucket/batch_id — narrow hydration relation
      blocks/bucket/batch_id, pairs/pbucket/batch_id — as before
      links/pbucket/batch_id   — scored ≥ τ edges of this batch's pairs
      clusters/nbucket         — mutable (node → component) mapping

    Exactly-once links follow from exactly-once pairs (links are a pure
    per-row function of a pair's two feature rows); cluster updates are
    idempotent-converging under retry (see _update_clusters).  The
    equivalence contract — stream N batches ≡ run the batch pipeline on
    the union corpus — is asserted in tests/test_streaming.py."""
    spark = batch_df.sparkSession
    feats = page_features(
        batch_df, num_hashes=num_hashes, prefix_len=prefix_len
    ).withColumn(
        "fbucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    ).persist()
    (
        feats.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("fbucket", "batch_id")
        .parquet(f"{store_dir}/features")
    )
    process_block_batch(
        batch_df, batch_id, store_dir, bands, rows_per_band, num_hashes,
        n_buckets, feats=feats.drop("fbucket"),
    )
    # this batch's COMMITTED new pairs (exactly-once across batches)
    pairs_base = f"{store_dir}/pairs"
    if not os.path.isdir(pairs_base):
        feats.unpersist()
        return
    new_pairs = (
        spark.read.parquet(pairs_base)
        .filter(F.col("batch_id") == batch_id)
        .select("url_a", "url_b")
        .persist()
    )
    fbuckets = [
        r["b"]
        for r in new_pairs.select(
            F.explode(
                F.array(
                    F.pmod(F.xxhash64("url_a"), F.lit(n_buckets)).cast("int"),
                    F.pmod(F.xxhash64("url_b"), F.lit(n_buckets)).cast("int"),
                )
            ).alias("b")
        ).distinct().collect()
    ]
    hydr = read_store_buckets(spark, f"{store_dir}/features", fbuckets, col="fbucket")
    if hydr is None:
        new_pairs.unpersist()
        feats.unpersist()
        return
    from pyspark.sql import Window as _W

    from ..operators.scoring import match_links, score_pairs_from_features

    # a re-crawled url exists under several batch_ids in the features
    # store; NEW pairs must score against its LATEST features only
    # (pairs committed by earlier batches keep their at-ingest scores —
    # the incremental contract)
    latest = _W.partitionBy("url").orderBy(F.col("batch_id").desc())
    hydr = (
        hydr.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    scored = score_pairs_from_features(
        new_pairs, hydr.select("url", "vec", "sig", "prefix"), weights
    )
    links = match_links(scored, tau).persist()
    (
        links.withColumn(
            "pbucket",
            F.pmod(F.xxhash64("url_a", "url_b"), F.lit(n_buckets)).cast("int"),
        )
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pbucket", "batch_id")
        .parquet(f"{store_dir}/links")
    )
    _update_clusters(spark, store_dir, links, n_buckets)
    links.unpersist()
    new_pairs.unpersist()
    feats.unpersist()


def incremental_linkage(
    pages_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """writeStream wrapper running the FULL pipeline per micro-batch —
    the streaming counterpart of run_linkage."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_linkage_batch(batch_df, batch_id, store_dir, **kwargs)

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def incremental_blocking(
    pages_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    bands: int = 16,
    rows_per_band: int = 2,
    num_hashes: int = 32,
    n_buckets: int = 64,
):
    """pages stream → blocks/pairs stores updated per micro-batch via
    `process_block_batch` (idempotent bucket/batch_id dynamic-overwrite
    writes + bucket-pruned accumulated join + cross-batch pair
    anti-join).  Spark's checkpoint tracks committed batch ids — the
    streaming analogue of the SnapshotStore manifest; together with the
    dynamic-overwrite sink a crash/retry at any point converges to
    exactly-once output, including for re-crawled urls seen again in
    later batches."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_block_batch(
            batch_df, batch_id, store_dir, bands, rows_per_band, num_hashes, n_buckets
        )

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def pages_per_window(
    pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window ingest counts by language — late pages
    beyond the watermark are dropped deterministically (the Structured
    Streaming late-data contract)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
