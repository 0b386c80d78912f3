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


def test_incremental_store_read_is_pruned(spark, tmp_path):
    """The accumulated-store join must NOT read the whole corpus per
    batch: the scan of blocks is partition-pruned to the batch's buckets
    (observable as a partition filter on `bucket` in the plan)."""
    from biomedical_el_spark.streaming.incremental import process_block_batch

    store = str(tmp_path / "store_prune")
    pages = generate_pages(spark, 60, cluster_size=4).drop("entity_id").cache()
    process_block_batch(pages, 0, store, n_buckets=4)
    acc = spark.read.parquet(store + "/blocks").filter(F.col("bucket").isin([1]))
    plan = acc._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


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
