"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract as Arrow-batched stubs.

The Spark-side contract is real and tested (schemas, partitioning, UDF
signatures, batch shapes); the actual media decoding is stubbed because
the image/audio libraries are not in this container — `decode_frames`
raises NotImplementedError unless `fake=True`, in which case it produces
a deterministic fake feature vector so the distributed plumbing can be
exercised end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM exprs
    (length, content hash, routing tag).  No Python in this path."""
    n = F.length(F.col(bin_col))
    return df.select(
        F.col(id_col),
        n.alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_hash"),
        F.when(n % 3 == 0, "image")
        .when(n % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


def extract_features(
    df: DataFrame, id_col: str, bin_col: str, dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    Batch shape: Iterator[pd.DataFrame[(id, payload)]] →
    Iterator[pd.DataFrame[(id, features: list<float>, n_bytes: long)]].
    Partitioning is preserved (narrow op); at scale repartition by a
    bucket of id first so decode cost spreads evenly.
    """

    schema = f"{id_col} long, features array<float>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-worker init point: load the real decoder model here
        if not fake:
            raise NotImplementedError(
                "media decoding requires image/audio libs not present in "
                "this container; pass fake=True for the deterministic stub"
            )
        for pdf in batches:
            payloads = pdf[bin_col]
            lens = payloads.map(len).to_numpy(dtype=np.int64)
            # deterministic fake 'decoder': byte-sum folded into dim dims
            feats = []
            for p in payloads:
                arr = np.frombuffer(p, dtype=np.uint8)
                if len(arr) == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                pad = (-len(arr)) % dim
                m = np.pad(arr, (0, pad)).reshape(-1, dim)
                feats.append(m.sum(axis=0).astype(np.float32))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats, "n_bytes": lens}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)
