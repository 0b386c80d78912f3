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
    stream_pairs = spark.read.parquet(store + "/pairs").distinct()
    missing = batch_pairs.exceptAll(stream_pairs)
    assert missing.count() == 0


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
