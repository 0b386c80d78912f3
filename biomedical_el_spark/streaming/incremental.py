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


def incremental_blocking(
    pages_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    bands: int = 16,
    rows_per_band: int = 2,
    num_hashes: int = 32,
):
    """pages stream → append (url, block_key) micro-batches to the blocks
    store, and emit new candidate pairs (new × accumulated) per batch.

    foreachBatch gives exactly-once appends keyed by batch id (Spark
    tracks committed batches in the checkpoint — the streaming analogue
    of the SnapshotStore manifest).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        feats = page_features(batch_df, num_hashes=num_hashes)
        keys = band_keys_from_sig(feats, bands, rows_per_band)
        keys.write.mode("append").parquet(f"{store_dir}/blocks")
        # incremental pairs: this batch's keys × all accumulated keys
        acc = spark.read.parquet(f"{store_dir}/blocks")
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
        new_pairs.write.mode("append").parquet(f"{store_dir}/pairs")

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
