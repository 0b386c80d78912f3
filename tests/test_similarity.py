"""Similarity kernels vs independent oracles (DuckDB + numpy)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from biomedical_el_spark.functions.similarity import jaro_winkler_batch
from biomedical_el_spark.functions.embedder import _embed_batch


WORDS = [
    "", "a", "ab", "martha", "marhta", "dixon", "dicksonx", "jellyfish",
    "smellyfish", "spark", "sparc", "entity resolution", "entity-resolution",
    "the quick brown fox jumps over the lazy dog", "duplicate page text",
    "duplicate page texts", "abcdefghijklmnopqrstuvwxyz0123456789",
]


def test_jaro_winkler_matches_duckdb():
    pairs = [(a, b) for a in WORDS for b in WORDS]
    sa = pd.Series([p[0] for p in pairs])
    sb = pd.Series([p[1] for p in pairs])
    ours = jaro_winkler_batch(sa, sb)
    con = duckdb.connect()
    theirs = np.array(
        [
            con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            for a, b in pairs
        ]
    )
    assert np.allclose(ours, theirs, atol=1e-12), (
        [(p, o, t) for p, o, t in zip(pairs, ours, theirs) if abs(o - t) > 1e-12][:10]
    )


def test_jaro_winkler_properties():
    sa = pd.Series(["same text", "x", ""])
    sb = pd.Series(["same text", "y", ""])
    out = jaro_winkler_batch(sa, sb)
    assert out[0] == 1.0
    assert out[1] == 0.0
    assert out[2] == 0.0  # DuckDB convention for both-empty


def test_embedder_deterministic_and_normalized():
    texts = pd.Series(["hello world", "hello world", "other doc", ""])
    v1 = _embed_batch(texts)
    v2 = _embed_batch(texts.copy())
    assert np.array_equal(v1, v2)
    assert np.array_equal(v1[0], v1[1])
    assert not np.array_equal(v1[0], v1[2])
    norms = np.linalg.norm(v1, axis=1)
    assert np.allclose(norms[:3], 1.0, atol=1e-5)
    assert norms[3] == 0.0


def test_embedder_batch_boundary_independence():
    # same text embeds identically regardless of batch composition
    a = _embed_batch(pd.Series(["doc one text", "doc two text"]))
    b = _embed_batch(pd.Series(["doc two text"]))
    assert np.allclose(a[1], b[0])
