"""W4 BIO span decode: the window/aggregate closed form must match the
reference's sequential walk (run_e2e_span.py:383-447, tag-only) on EVERY
tag sequence up to length 6 — exhaustive, not sampled."""

from itertools import product

from pyspark.sql import functions as F

from biomedical_el_spark.operators.bio import bio_decode_sequential, bio_span_decode
from biomedical_el_spark.plans import catalog

# Hand-derived from the reference loop (0=O, 1=B, 2=I): pins the
# executable spec itself, including the quirks — B-after-B discards the
# earlier span; I-after-O opens a span; EOF emits an open span.
REFERENCE_CASES = [
    ([0], []),
    ([1], [(0, 0)]),
    ([2], [(0, 0)]),
    ([1, 0], [(0, 0)]),
    ([1, 1], [(1, 1)]),          # B-after-B: first span discarded
    ([1, 2, 1, 0], [(2, 2)]),    # B inside a run resets, earlier part lost
    ([2, 2], [(0, 1)]),          # I-after-start opens
    ([0, 2, 2, 0], [(1, 2)]),    # I-after-O opens
    ([1, 2, 2], [(0, 2)]),       # trailing open span emitted
    ([2, 1, 2], [(1, 2)]),
    ([1, 0, 1], [(0, 0), (2, 2)]),
    ([0, 0, 0], []),
]


def test_sequential_spec_matches_reference_cases():
    for tags, want in REFERENCE_CASES:
        assert bio_decode_sequential(tags) == want, tags


def test_window_decode_matches_sequential_exhaustively(spark):
    seqs = [list(s) for n in range(1, 7) for s in product((0, 1, 2), repeat=n)]
    rows = [
        (i, pos, tag)
        for i, tags in enumerate(seqs)
        for pos, tag in enumerate(tags)
    ]
    df = spark.createDataFrame(rows, "doc_id int, pos int, tag int")
    got = {}
    for r in bio_span_decode(df).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for i, tags in enumerate(seqs):
        want = bio_decode_sequential(tags)
        assert sorted(got.get(i, [])) == sorted(want), (tags, got.get(i))


def test_catalog_bio_decode_shape(spark):
    out = catalog.w_bio_decode(spark, "/root/testdata/sf0.001").persist()
    n = out.count()
    assert n > 0
    bad = out.filter(
        (F.col("span_start") > F.col("span_end"))
        | (F.col("n_tokens") != F.col("span_end") - F.col("span_start") + 1)
    ).count()
    out.unpersist()
    assert bad == 0


def test_subword_window_decode_matches_sequential_exhaustively(spark):
    """The `##` subword clause closed form vs the FULL reference walk
    (including its dead-j-increment double counting and the stale
    position-0 anchor): every (tags, cont) pair of length <= 6 —
    exhaustive, not sampled (~56k documents, one decode pass)."""
    from biomedical_el_spark.operators.bio import (
        bio_decode_sequential_subword,
        bio_span_decode_subword,
    )

    docs = []
    for n in range(1, 7):
        for tags in product((0, 1, 2), repeat=n):
            for cont in product((0, 1), repeat=n):
                docs.append((list(tags), list(cont)))
    rows = [
        (i, pos, tag, c)
        for i, (tags, cont) in enumerate(docs)
        for pos, (tag, c) in enumerate(zip(tags, cont))
    ]
    df = spark.createDataFrame(rows, "doc_id int, pos int, tag int, cont int")
    got = {}
    for r in bio_span_decode_subword(df).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    mismatches = []
    for i, (tags, cont) in enumerate(docs):
        want = bio_decode_sequential_subword(tags, cont)
        if sorted(got.get(i, [])) != sorted(want):
            mismatches.append((tags, cont, sorted(got.get(i, [])), sorted(want)))
    assert not mismatches, mismatches[:5]
