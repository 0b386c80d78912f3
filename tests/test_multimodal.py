"""Multimodal plumbing: binary metadata exprs + mapInPandas feature
extraction stub (schema, batch shape, determinism)."""

import pytest
from pyspark.sql import functions as F

from biomedical_el_spark.operators.multimodal import binary_metadata, extract_features


@pytest.fixture(scope="module")
def payloads(spark):
    return spark.range(50).select(
        F.col("id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias("payload"),
    ).cache()


def test_binary_metadata(spark, payloads):
    meta = binary_metadata(payloads, "id", "payload")
    rows = {r["id"]: r for r in meta.collect()}
    assert rows[7]["n_bytes"] == len(b"payload-7")
    assert rows[7]["media_type"] in {"image", "audio", "video"}
    assert len(rows[7]["content_hash"]) == 32


def test_extract_features_stub(spark, payloads):
    feats = extract_features(payloads, "id", "payload", dim=16, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic across runs
    again = {r["id"]: r["features"] for r in extract_features(payloads, "id", "payload", dim=16).collect()}
    for r in rows:
        assert again[r["id"]] == r["features"]


def test_extract_features_real_decoder_is_stubbed(spark, payloads):
    with pytest.raises(Exception):
        extract_features(payloads, "id", "payload", fake=False).collect()
