"""Incremental blocking over a stream of new pages.

The reference has no streaming (SURVEY.md §2.9); this is the natural
extension the north_star sketches: new Common-Crawl snapshots arrive,
each micro-batch is featurized with the SAME batched UDFs as the batch
pipeline (one code path → the byte-identical text invariant holds across
batch and stream), band keys are appended to the blocks store, and new
candidate pairs are emitted by joining the micro-batch's keys against
the accumulated key store — incremental ER without recomputing old
blocks.

Also provides the watermarked windowed ingest-rate aggregation
(`pages_per_window`) — the standard late-data-tolerant stream metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.features import band_keys_from_sig, page_features
from ..sources.pages import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-source stream of page parquet drops (one file = one crawl
    shard).  On a cluster this is Kafka/Iceberg-incremental instead."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def process_block_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    bands: int = 16,
    rows_per_band: int = 2,
    num_hashes: int = 32,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of incremental blocking.  Module-level (not a
    closure) so idempotency is directly testable: calling it twice with
    the same batch_id must leave the store unchanged.

    Idempotency: outputs are partitioned by batch_id and written with
    DYNAMIC partition overwrite — a retried micro-batch REPLACES its own
    partition instead of appending duplicates (which would inflate block
    sizes past the cap and duplicate pairs downstream).

    Store pruning: the blocks store is additionally partitioned by
    bucket = pmod(block_key, n_buckets), and the accumulated-store join
    reads ONLY the partitions whose bucket appears in this batch — the
    per-batch read scales with the batch's key coverage, not the corpus.
    (On a cluster the store is an Iceberg table with a bloom filter on
    block_key; parquet directory pruning is the local-mode equivalent.)
    """
    spark = batch_df.sparkSession
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
        .partitionBy("batch_id", "bucket")
        .parquet(f"{store_dir}/blocks")
    )
    # incremental pairs: this batch's keys × accumulated keys, reading
    # only the store buckets this batch can possibly match (pruned scan)
    buckets = [r["bucket"] for r in keys.select("bucket").distinct().collect()]
    acc = spark.read.parquet(f"{store_dir}/blocks").filter(
        F.col("bucket").isin(buckets)
    )
    new_pairs = (
        keys.withColumnRenamed("url", "url_a")
        .join(acc.withColumnRenamed("url", "url_b"), "block_key")
        .filter(F.col("url_a") != F.col("url_b"))
        .select(
            F.least("url_a", "url_b").alias("url_a"),
            F.greatest("url_a", "url_b").alias("url_b"),
        )
        .distinct()
    )
    (
        new_pairs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{store_dir}/pairs")
    )
    keys.unpersist()


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
    `process_block_batch` (idempotent batch_id-partitioned writes +
    bucket-pruned accumulated join).  Spark's checkpoint tracks committed
    batch ids — the streaming analogue of the SnapshotStore manifest;
    together with the dynamic-overwrite sink a crash/retry at any point
    converges to exactly-once output."""

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
