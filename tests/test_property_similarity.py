"""Property tests (hypothesis): the vectorized Jaro-Winkler matches
DuckDB's reference implementation on arbitrary strings — including
multi-byte text, where BOTH are utf-8 byte-wise (verified here: DuckDB
counts 'À' as two units) — the NFD accent stripper matches Python
unicodedata and DuckDB, and the MinHash estimate tracks exact Jaccard."""

import unicodedata

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from biomedical_el_spark.functions.minhash_np import minhash_batch
from biomedical_el_spark.functions.similarity import jaro_winkler_batch
from biomedical_el_spark.functions.text import strip_accents_batch

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=64
)

# multi-byte mix: latin-1 accents, greek, cyrillic, CJK, plus ASCII —
# excludes surrogates (invalid in parquet/arrow strings anyway)
unicode_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.characters(min_codepoint=0xC0, max_codepoint=0x17F),
        st.characters(min_codepoint=0x390, max_codepoint=0x3C9),
        st.characters(min_codepoint=0x410, max_codepoint=0x44F),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80),
    ),
    max_size=64,
)


@settings(max_examples=300, deadline=None)
@given(a=ascii_text, b=ascii_text)
def test_jw_matches_duckdb(a, b):
    ours = jaro_winkler_batch(pd.Series([a]), pd.Series([b]))[0]
    ref = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(ours - ref) < 1e-9, (a, b, ours, ref)


@settings(max_examples=300, deadline=None)
@given(a=unicode_text, b=unicode_text)
def test_jw_matches_duckdb_multibyte(a, b):
    """Byte-wise parity on non-ASCII: DuckDB's jaro_winkler_similarity
    operates on utf-8 code units (an accented char counts as 2+), and so
    does our kernel — this test pins that shared semantics."""
    ours = jaro_winkler_batch(pd.Series([a]), pd.Series([b]))[0]
    ref = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert abs(ours - ref) < 1e-9, (a, b, ours, ref)


@settings(max_examples=200, deadline=None)
@given(s=unicode_text)
def test_strip_accents_matches_unicodedata_and_duckdb(s):
    """NFD + drop-Mn must equal the reference BasicTokenizer
    (_run_strip_accents) byte for byte; DuckDB's strip_accents agrees on
    the NFD-decomposable range drawn here."""
    ours = strip_accents_batch(pd.Series([s]))[0]
    ref = "".join(
        c for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn"
    )
    assert ours == ref
    duck = duckdb.sql("SELECT strip_accents(?)", params=[s]).fetchone()[0]
    assert ours == duck, (s, ours, duck)


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
