"""Blocking + pair generation: recall on near-dup clusters, block-size
caps reported, salted hydration join correctness."""

from pyspark.sql import functions as F

from biomedical_el_spark.operators import blocking as B
from biomedical_el_spark.operators import pairs as P


def test_near_duplicates_share_blocks(spark, pages):
    blocks = B.shingle_blocks(pages, num_hashes=32, bands=16, rows_per_band=2).unionByName(
        B.embedding_blocks(pages, 12)
    )
    cand, _ = P.candidate_pairs(blocks, max_block_size=64)
    ent = pages.select("url", "entity_id")
    j = (
        cand.join(ent.withColumnRenamed("url", "url_a").withColumnRenamed("entity_id", "ea"), "url_a")
        .join(ent.withColumnRenamed("url", "url_b").withColumnRenamed("entity_id", "eb"), "url_b")
    )
    intra = j.filter(F.col("ea") == F.col("eb")).count()
    gold = (
        pages.groupBy("entity_id").count().select((F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .agg(F.sum("p")).collect()[0][0]
    )
    assert intra / gold >= 0.97  # dual-channel blocking recall on true pairs


def test_oversized_blocks_reported_not_silent(spark, pages):
    blocks = B.shingle_blocks(pages)
    _, oversized = P.candidate_pairs(blocks, max_block_size=3)
    assert oversized.count() > 0
    assert set(oversized.columns) == {"block_key", "block_size"}


def test_pairs_are_canonical_and_distinct(spark, pages):
    blocks = B.shingle_blocks(pages)
    cand, _ = P.candidate_pairs(blocks)
    assert cand.filter(F.col("url_a") >= F.col("url_b")).count() == 0
    assert cand.count() == cand.distinct().count()


def test_salted_join_matches_plain_join(spark, pages):
    blocks = B.shingle_blocks(pages)
    cand, _ = P.candidate_pairs(blocks)
    cand = cand.limit(500).cache()
    feats = pages.select("url", "lang")
    salted = P.salted_feature_join(cand, feats, salt_buckets=4, feature_cols=("lang",))
    fa = feats.select(F.col("url").alias("url_a"), F.col("lang").alias("lang_a"))
    fb = feats.select(F.col("url").alias("url_b"), F.col("lang").alias("lang_b"))
    plain = cand.join(fa, "url_a").join(fb, "url_b")
    assert salted.count() == plain.count()
    s = {tuple(r) for r in salted.select("url_a", "url_b", "lang_a", "lang_b").collect()}
    p = {tuple(r) for r in plain.select("url_a", "url_b", "lang_a", "lang_b").collect()}
    assert s == p
