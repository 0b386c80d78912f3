"""Property tests (hypothesis): the vectorized Jaro-Winkler matches
DuckDB's reference implementation on arbitrary ASCII strings, and the
MinHash estimate tracks exact Jaccard."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from biomedical_el_spark.functions.minhash_np import minhash_batch
from biomedical_el_spark.functions.similarity import jaro_winkler_batch

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=64
)


@settings(max_examples=300, deadline=None)
@given(a=ascii_text, b=ascii_text)
def test_jw_matches_duckdb(a, b):
    ours = jaro_winkler_batch(pd.Series([a]), pd.Series([b]))[0]
    ref = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(ours - ref) < 1e-9, (a, b, ours, ref)


@settings(max_examples=30, deadline=None)
@given(
    words=st.lists(
        st.sampled_from([f"w{i}" for i in range(30)]), min_size=10, max_size=60
    ),
    muts=st.integers(min_value=0, max_value=10),
)
def test_minhash_tracks_jaccard(words, muts):
    a = list(words)
    b = list(words)
    for m in range(muts):
        b[m % len(b)] = f"m{m}"
    ta, tb = " ".join(a), " ".join(b)
    sig = minhash_batch(pd.Series([ta, tb]), num_hashes=128)
    est = float((sig[0] == sig[1]).mean())
    sa = {tuple(a[i : i + 3]) for i in range(len(a) - 2)}
    sb = {tuple(b[i : i + 3]) for i in range(len(b) - 2)}
    exact = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
    assert abs(est - exact) < 0.18  # 128 hashes → s.e. ≈ 0.044; 4σ bound
