"""Structured Streaming: incremental blocking over page-file drops and
watermarked windowed aggregation."""

from pyspark.sql import functions as F

from biomedical_el_spark.datagen.pages import generate_pages
from biomedical_el_spark.streaming.incremental import (
    incremental_blocking,
    pages_per_window,
    read_page_stream,
)


def test_incremental_blocking_matches_batch(spark, tmp_path):
    src = str(tmp_path / "drops")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    all_pages = generate_pages(spark, 120, cluster_size=4).drop("entity_id").cache()
    # two crawl shards arriving separately
    all_pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).coalesce(
        1
    ).write.parquet(src + "/shard=0")
    all_pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).coalesce(
        1
    ).write.parquet(src + "/shard=1")

    stream = read_page_stream(spark, src + "/shard=*", max_files=1)
    q = incremental_blocking(stream, store, ckpt).start()
    q.awaitTermination(120)

    blocks = spark.read.parquet(store + "/blocks")
    # every page got its band keys exactly once
    assert blocks.select("url").distinct().count() == 120
    per_url = blocks.groupBy("url").count().select("count").distinct().collect()
    assert len(per_url) == 1  # same key count per page (16 bands)

    # accumulated incremental pairs ⊇ the batch pipeline's shingle pairs
    from biomedical_el_spark.operators.features import (
        band_keys_from_sig,
        page_features,
    )
    from biomedical_el_spark.operators.pairs import candidate_pairs_grouped

    feats = page_features(all_pages)
    batch_pairs, _ = candidate_pairs_grouped(
        band_keys_from_sig(feats, 16, 2), max_block_size=None
    )
    stream_pairs = (
        spark.read.parquet(store + "/pairs").select("url_a", "url_b").distinct()
    )
    missing = batch_pairs.exceptAll(stream_pairs)
    assert missing.count() == 0


def test_incremental_batch_retry_is_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id) must REPLACE its own output,
    not append duplicates — block sizes and pairs stay exact."""
    from biomedical_el_spark.streaming.incremental import process_block_batch

    store = str(tmp_path / "store_retry")
    pages = generate_pages(spark, 60, cluster_size=4).drop("entity_id").cache()
    b0 = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    b1 = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    process_block_batch(b0, 0, store)
    process_block_batch(b1, 1, store)
    blocks_once = spark.read.parquet(store + "/blocks").count()
    pairs_once = (
        spark.read.parquet(store + "/pairs").select("url_a", "url_b").distinct().count()
    )
    process_block_batch(b1, 1, store)  # simulated retry of the last batch
    assert spark.read.parquet(store + "/blocks").count() == blocks_once
    assert (
        spark.read.parquet(store + "/pairs").select("url_a", "url_b").distinct().count()
        == pairs_once
    )
    # and not just distinct-equal: no physical duplicates either
    raw = spark.read.parquet(store + "/pairs").count()
    dedup = spark.read.parquet(store + "/pairs").distinct().count()
    assert raw == dedup


def test_incremental_store_rows_read_scales_with_coverage(spark, tmp_path):
    """The accumulated-store join must NOT read the whole corpus per
    batch.  With the bucket-first layout, a small batch covering k of
    n_buckets buckets reads ~k/n of the store's rows (and lists only
    those bucket directories) — rows read scale with the batch's key
    coverage, not with corpus size.  Fixture: a 10× corpus already in
    the store, then a small batch."""
    from biomedical_el_spark.streaming.incremental import (
        process_block_batch,
        read_store_buckets,
    )

    store = str(tmp_path / "store_prune")
    n_buckets = 256
    corpus = generate_pages(spark, 600, cluster_size=4).drop("entity_id").cache()
    small = corpus.limit(8).cache()
    # 10× corpus committed first; bands=4 keeps the small batch's bucket
    # coverage well under n_buckets (8 pages × 4 band keys ≤ 32 buckets)
    process_block_batch(
        corpus, 0, store, bands=4, rows_per_band=8, n_buckets=n_buckets
    )
    process_block_batch(
        small, 1, store, bands=4, rows_per_band=8, n_buckets=n_buckets
    )
    blocks = spark.read.parquet(store + "/blocks")
    total_rows = blocks.count()
    covered = [
        r["bucket"]
        for r in blocks.filter(F.col("batch_id") == 1)
        .select("bucket")
        .distinct()
        .collect()
    ]
    assert 0 < len(covered) <= 32
    acc = read_store_buckets(spark, store + "/blocks", covered)
    rows_read = acc.count()
    # every listed file is under a covered bucket directory …
    assert all(
        any(f"/bucket={b}/" in f for b in covered) for f in acc.inputFiles()
    )
    # … and the read is a small, coverage-proportional slice of the store
    frac = len(covered) / n_buckets
    assert rows_read <= total_rows * frac * 2.5
    assert rows_read < total_rows / 2


def test_recrawled_url_pairs_exactly_once(spark, tmp_path):
    """A url re-crawled in a later micro-batch regenerates pairs an
    earlier batch already committed; the anti-join against the committed
    pairs store must keep the store exactly-once ACROSS batch partitions
    (not merely within each)."""
    from biomedical_el_spark.streaming.incremental import process_block_batch

    store = str(tmp_path / "store_recrawl")
    pages = generate_pages(spark, 60, cluster_size=4).drop("entity_id").cache()
    b0 = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).cache()
    b1_new = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    b1 = b1_new.unionByName(b0.limit(10)).cache()  # 10 re-crawled urls
    process_block_batch(b0, 0, store)
    process_block_batch(b1, 1, store)
    raw = spark.read.parquet(store + "/pairs")
    dup_across = (
        raw.groupBy("url_a", "url_b")
        .agg(F.countDistinct("batch_id").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert dup_across == 0
    assert raw.count() == raw.select("url_a", "url_b").distinct().count()
    # the re-crawl lost nothing: batch-pipeline pairs are still covered
    from biomedical_el_spark.operators.features import (
        band_keys_from_sig,
        page_features,
    )
    from biomedical_el_spark.operators.pairs import candidate_pairs_grouped

    batch_pairs, _ = candidate_pairs_grouped(
        band_keys_from_sig(page_features(pages), 16, 2), max_block_size=None
    )
    missing = batch_pairs.exceptAll(raw.select("url_a", "url_b"))
    assert missing.count() == 0


def test_compact_blocks_store(spark, tmp_path):
    """Compaction merges per-batch files into one batch_id=-1 partition
    per bucket: same rows, far fewer files, and the stream keeps working
    against the compacted store (new batch still pairs with old keys)."""
    import glob

    from biomedical_el_spark.streaming.incremental import (
        compact_blocks_store,
        process_block_batch,
    )

    store = str(tmp_path / "store_compact")
    pages = generate_pages(spark, 90, cluster_size=4).drop("entity_id").cache()
    shards = [
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i).cache()
        for i in range(3)
    ]
    process_block_batch(shards[0], 0, store, n_buckets=8)
    process_block_batch(shards[1], 1, store, n_buckets=8)
    before = {  # materialize: compaction replaces the files on disk
        (r["url"], r["block_key"])
        for r in spark.read.parquet(store + "/blocks")
        .select("url", "block_key")
        .collect()
    }
    files_before = len(glob.glob(store + "/blocks/**/*.parquet", recursive=True))
    compact_blocks_store(spark, store, n_buckets=8)
    after = spark.read.parquet(store + "/blocks")
    assert after.count() == len(before)
    got = {
        (r["url"], r["block_key"])
        for r in after.select("url", "block_key").collect()
    }
    assert got == before
    assert set(
        r["batch_id"] for r in after.select("batch_id").distinct().collect()
    ) == {-1}
    files_after = len(glob.glob(store + "/blocks/**/*.parquet", recursive=True))
    assert files_after < files_before
    # stream continues: a new batch pairs against the compacted store
    process_block_batch(shards[2], 2, store, n_buckets=8)
    pairs = spark.read.parquet(store + "/pairs").select("url_a", "url_b")
    s2_urls = {r["url"] for r in shards[2].select("url").collect()}
    touching = pairs.filter(
        F.col("url_a").isin(s2_urls) | F.col("url_b").isin(s2_urls)
    )
    assert touching.count() > 0


def test_compaction_skips_uncommitted_batches(spark, tmp_path):
    """Crash safety: leaves of a batch with NO commit marker in the
    streaming checkpoint are carried over untouched (never absorbed into
    batch_id=-1), so the batch's retry dynamic-overwrites its own leaves
    instead of permanently duplicating rows the compaction absorbed."""
    import os

    from biomedical_el_spark.streaming.incremental import (
        compact_blocks_store,
        process_block_batch,
    )

    store = str(tmp_path / "store_crash")
    ckpt = str(tmp_path / "ckpt_crash")
    pages = generate_pages(spark, 60, cluster_size=4).drop("entity_id").cache()
    shards = [
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == i).cache()
        for i in range(2)
    ]
    # batch 0 committed; batch 1 "crashed" after writing, before commit
    process_block_batch(shards[0], 0, store, n_buckets=8)
    process_block_batch(shards[1], 1, store, n_buckets=8)
    os.makedirs(os.path.join(ckpt, "commits"))
    open(os.path.join(ckpt, "commits", "0"), "w").close()

    before = spark.read.parquet(store + "/blocks").count()
    compact_blocks_store(spark, store, n_buckets=8, checkpoint_dir=ckpt)
    after = spark.read.parquet(store + "/blocks")
    assert after.count() == before  # nothing lost, nothing duplicated
    ids = {r["batch_id"] for r in after.select("batch_id").distinct().collect()}
    assert ids == {-1, 1}  # batch 1's leaves survived uncompacted
    # the "retry" of batch 1 rewrites its own leaves — still no dupes
    process_block_batch(shards[1], 1, store, n_buckets=8)
    assert spark.read.parquet(store + "/blocks").count() == before


def test_pages_per_window_watermark(spark, tmp_path):
    src = str(tmp_path / "drops2")
    generate_pages(spark, 200, cluster_size=4).drop("entity_id").coalesce(
        1
    ).write.parquet(src)
    stream = read_page_stream(spark, src)
    agg = pages_per_window(stream, window="1 hour", watermark="2 hours")
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows closed by the watermark; the final
    # (open) window is withheld — verify emitted counts are plausible
    res = spark.read.parquet(out)
    assert set(res.columns) == {"window_start", "window_end", "lang", "n_pages"}
    total = res.agg(F.sum("n_pages")).collect()[0][0] or 0
    assert total <= 200


def test_streaming_linkage_equals_batch_pipeline(spark, tmp_path):
    """The FULL streaming pipeline (features → blocking → exactly-once
    pairs → scoring → τ links → incremental cluster maintenance) over N
    micro-batches must produce EXACTLY the batch pipeline's clusters on
    the union corpus — same (node, component) rows, min-node component
    ids included.  Batch config matches the streaming path's channels
    (band blocking only, uncapped); scoring params are BOTH defaults."""
    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage
    from biomedical_el_spark.streaming.incremental import (
        process_linkage_batch,
        read_clusters,
    )

    store = str(tmp_path / "store_full")
    pages = generate_pages(spark, 120, cluster_size=4).drop("entity_id").cache()
    shards = [
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i).cache()
        for i in range(3)
    ]
    for i, shard in enumerate(shards):
        process_linkage_batch(shard, i, store, n_buckets=8)

    streamed = {
        (r["node"], r["component"])
        for r in read_clusters(spark, store).collect()
    }
    batch = run_linkage(
        spark,
        pages,
        cfg=LinkageConfig(use_embedding_blocks=False, max_block_size=None),
    )
    expected = {
        (r["node"], r["component"]) for r in batch["clusters"].collect()
    }
    assert streamed == expected

    # replaying the last batch (crash-retry) must not change the answer
    process_linkage_batch(shards[2], 2, store, n_buckets=8)
    again = {
        (r["node"], r["component"])
        for r in read_clusters(spark, store).collect()
    }
    assert again == expected


def test_incremental_linkage_stream_wrapper(spark, tmp_path):
    """incremental_linkage (the writeStream wrapper over
    process_linkage_batch) runs end-to-end from file drops through the
    streaming checkpoint: clusters exist and re-running the stream with
    the same checkpoint is a no-op (no duplicated state)."""
    from biomedical_el_spark.streaming.incremental import (
        incremental_linkage,
        read_clusters,
        read_page_stream,
    )

    src = str(tmp_path / "drops_full")
    store = str(tmp_path / "store_stream_full")
    ckpt = str(tmp_path / "ckpt_stream_full")
    pages = generate_pages(spark, 60, cluster_size=4).drop("entity_id").cache()
    for i in range(2):
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == i).coalesce(
            1
        ).write.parquet(src + f"/shard={i}")

    stream = read_page_stream(spark, src + "/shard=*", max_files=1)
    q = incremental_linkage(stream, store, ckpt, n_buckets=8).start()
    q.awaitTermination(180)
    first = {
        (r["node"], r["component"])
        for r in read_clusters(spark, store).collect()
    }
    assert len(first) == 60
    assert len({c for _, c in first}) < 60  # real merges happened

    # restart against the same checkpoint: committed batches don't re-run
    stream2 = read_page_stream(spark, src + "/shard=*", max_files=1)
    q2 = incremental_linkage(stream2, store, ckpt, n_buckets=8).start()
    q2.awaitTermination(120)
    again = {
        (r["node"], r["component"])
        for r in read_clusters(spark, store).collect()
    }
    assert again == first


def test_crash_mid_cluster_swap_recovers_to_batch_result(
    spark, tmp_path, monkeypatch
):
    """r4 ADVICE (medium): a crash midway through the multi-bucket
    clusters rewrite must not leave a permanently split cluster.  The
    rewrite is now a journaled staged swap: inject a crash after the
    FIRST bucket rename of the final batch's commit (journal written =
    commit point passed, swap partial), then (a) a plain reader rolls
    the commit forward and already sees the full post-batch mapping,
    and (b) replaying the batch — what the streaming engine does for an
    uncommitted batch — converges to exactly the batch pipeline's
    clusters."""
    import os

    import pytest

    import biomedical_el_spark.streaming.incremental as inc
    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage

    store = str(tmp_path / "store_crash")
    pages = generate_pages(spark, 90, cluster_size=3).drop("entity_id").cache()
    shards = [
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i).cache()
        for i in range(3)
    ]
    inc.process_linkage_batch(shards[0], 0, store, n_buckets=8)
    inc.process_linkage_batch(shards[1], 1, store, n_buckets=8)

    real = inc._commit_swaps

    def crashing(store_dir, spec, fail_after=None):
        return real(store_dir, spec, fail_after=1)

    monkeypatch.setattr(inc, "_commit_swaps", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        inc.process_linkage_batch(shards[2], 2, store, n_buckets=8)
    monkeypatch.setattr(inc, "_commit_swaps", real)
    # the journal is the commit point and must have survived the crash
    assert os.path.exists(inc._journal_path(store))

    batch = run_linkage(
        spark,
        pages,
        cfg=LinkageConfig(use_embedding_blocks=False, max_block_size=None),
    )
    expected = {
        (r["node"], r["component"]) for r in batch["clusters"].collect()
    }

    # (a) read-side roll-forward: committed state is already the full
    # post-batch mapping, never a partial one
    recovered = {
        (r["node"], r["component"])
        for r in inc.read_clusters(spark, store).collect()
    }
    assert recovered == expected
    assert not os.path.exists(inc._journal_path(store))

    # (b) crash-retry replay of the uncommitted batch is a no-op
    inc.process_linkage_batch(shards[2], 2, store, n_buckets=8)
    streamed = {
        (r["node"], r["component"])
        for r in inc.read_clusters(spark, store).collect()
    }
    assert streamed == expected


def test_clusters_mirror_pruned_member_scan(spark, tmp_path, monkeypatch):
    """r4 verdict #4: the members-of-merged-components lookup must read
    only the affected component buckets of the component-keyed mirror
    (and the link-endpoint lift only the batch's node buckets) — not
    the whole mapping.  Fixture: 600-page corpus committed first, then
    an 8-page batch whose pages are each the MIN-url member of their
    cluster, forcing 8 component renames; with n_buckets=256 both reads
    must cover a small bucket subset.  The mirror must stay
    row-identical to the primary store after every batch."""
    from pyspark.sql import Window

    import biomedical_el_spark.streaming.incremental as inc

    store = str(tmp_path / "store_mirror")
    n_buckets = 256
    pages = generate_pages(spark, 600, cluster_size=4).cache()
    w = Window.partitionBy("entity_id").orderBy("url")
    ranked = pages.withColumn("rn", F.row_number().over(w))
    holdout_entities = [
        r["entity_id"]
        for r in pages.select("entity_id").distinct().limit(8).collect()
    ]
    held = ranked.filter(
        (F.col("rn") == 1) & F.col("entity_id").isin(holdout_entities)
    ).drop("rn", "entity_id").cache()
    rest = ranked.filter(
        (F.col("rn") > 1) | ~F.col("entity_id").isin(holdout_entities)
    ).drop("rn", "entity_id").cache()
    assert held.count() == 8

    inc.process_linkage_batch(rest, 0, store, n_buckets=n_buckets)

    def mapping(path):
        import os as _os

        if not _os.path.isdir(path):
            return set()
        return {
            (r["node"], r["component"])
            for r in spark.read.parquet(path)
            .select("node", "component")
            .collect()
        }

    prim = mapping(store + "/clusters")
    assert prim == mapping(store + "/clusters_by_comp")

    calls = []
    real = inc.read_store_buckets

    def spy(spark_, st, buckets, col="bucket"):
        calls.append((st, sorted(set(buckets)), col))
        return real(spark_, st, buckets, col)

    monkeypatch.setattr(inc, "read_store_buckets", spy)
    inc.process_linkage_batch(held, 1, store, n_buckets=n_buckets)
    monkeypatch.setattr(inc, "read_store_buckets", real)

    lift_reads = [c for c in calls if c[0].endswith("/clusters") and c[2] == "nbucket"]
    member_reads = [c for c in calls if c[2] == "cbucket"]
    assert lift_reads and member_reads
    # lift: endpoints of the batch's links only (≤ ~40 nodes ≪ 256)
    assert all(len(b) <= 64 for _, b, _ in lift_reads)
    # member scan: cbuckets of the ≤8 merged components only
    assert all(len(b) <= 16 for _, b, _ in member_reads[:1])

    after = mapping(store + "/clusters")
    assert after == mapping(store + "/clusters_by_comp")
    # the renames actually happened: every held-out page is now a
    # component id covering its cluster members
    comps = {c for _, c in after}
    held_urls = {r["url"] for r in held.select("url").collect()}
    assert held_urls & comps


def test_stream_kill_after_links_restart_equals_batch(
    spark, tmp_path, monkeypatch
):
    """r4 verdict #5: kill the STREAM itself mid-batch — after the batch's
    links are written but before _update_clusters touches the clusters
    store — then restart `incremental_linkage` against the same
    checkpoint.  The failed batch was never committed to the streaming
    checkpoint, so the engine replays it; replay must converge to
    exactly the batch pipeline's clusters on the union corpus (the
    earlier crash tests drive process_linkage_batch directly — this one
    exercises the real foreachBatch checkpoint-restart path)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    import biomedical_el_spark.streaming.incremental as inc
    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage

    src = str(tmp_path / "drops_kill")
    store = str(tmp_path / "store_kill")
    ckpt = str(tmp_path / "ckpt_kill")
    pages = generate_pages(spark, 90, cluster_size=3).drop("entity_id").cache()
    for i in range(3):
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i).coalesce(
            1
        ).write.parquet(src + f"/shard={i}")

    real = inc._update_clusters
    calls = {"n": 0}

    def dying(spark_, store_dir, links, n_buckets):
        calls["n"] += 1
        if calls["n"] == 2:  # links of micro-batch 1 are already on disk
            raise RuntimeError("injected kill after links write")
        return real(spark_, store_dir, links, n_buckets)

    monkeypatch.setattr(inc, "_update_clusters", dying)
    stream = inc.read_page_stream(spark, src + "/shard=*", max_files=1)
    q = inc.incremental_linkage(stream, store, ckpt, n_buckets=8).start()
    with pytest.raises(StreamingQueryException, match="injected kill"):
        q.awaitTermination(180)
    monkeypatch.setattr(inc, "_update_clusters", real)

    # restart against the same checkpoint: the uncommitted batch replays
    stream2 = inc.read_page_stream(spark, src + "/shard=*", max_files=1)
    q2 = inc.incremental_linkage(stream2, store, ckpt, n_buckets=8).start()
    q2.awaitTermination(180)

    streamed = {
        (r["node"], r["component"])
        for r in inc.read_clusters(spark, store).collect()
    }
    batch = run_linkage(
        spark,
        pages,
        cfg=LinkageConfig(use_embedding_blocks=False, max_block_size=None),
    )
    expected = {
        (r["node"], r["component"]) for r in batch["clusters"].collect()
    }
    assert streamed == expected
