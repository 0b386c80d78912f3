"""BIO tag-sequence → mention-span decode (SURVEY.md §2.5 W4; reference
`run_e2e_span.py:383-447` `get_mention_spans`).

The reference walks each document's predicted tag sequence (0=O, 1=B,
2=I) sequentially: a B opens a span at j (silently DISCARDING any
unclosed span — B-after-B keeps only the later one); an I extends the
open span, or OPENS one when the previous tag is O ("imperfect though",
reference's own comment); an O closes and emits; a span still open at
the end is emitted.  (The reference also extends spans over WordPiece
`##` continuation tokens; that clause binds to subword re-tokenization,
which is out of scope here — our candidate unit is extracted text, per
SURVEY §2.5 — so this operator decodes pure tag streams.)

For tag streams those sequential semantics collapse to a closed form
that needs no per-row loop:

    each maximal run of non-O tags emits EXACTLY ONE span,
    ending at the run's end and starting at the run's LAST B
    (or the run's start if the run contains no B).

Proof sketch: within a run, every B resets (start=end=j) and discards;
every I extends; only the run boundary (O or EOF) emits.  So the decode
is a window + aggregate — fully distributed, shuffle only on doc_id,
and DuckDB-oracle-checkable (catalog `w_bio_decode`) — instead of the
reference's per-document Python walk.  `bio_decode_sequential` is the
direct sequential transcription of those semantics, kept as the
executable spec: tests/test_bio.py checks the window formulation against
it EXHAUSTIVELY over every tag sequence of length ≤ 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bio_span_decode(
    tagged: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    tag_col: str = "tag",
) -> DataFrame:
    """Decode (id, pos, tag∈{0,1,2}) rows into one span row per mention:
    (id, span_no, span_start, span_end, n_tokens), reference semantics.

    Single hash-shuffle on id_col (window + groupBy share it); the
    aggregation is map-side partial.  span_no is the count of O tags
    before the run — deterministic and engine-independent."""
    w = (
        Window.partitionBy(id_col)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_o = (F.col(tag_col) == 0).cast("int")
    runs = tagged.withColumn("span_no", F.sum(is_o).over(w)).filter(
        F.col(tag_col) != 0
    )
    return (
        runs.groupBy(id_col, "span_no")
        .agg(
            F.coalesce(
                F.max(F.when(F.col(tag_col) == 1, F.col(pos_col))),
                F.min(pos_col),
            ).cast("bigint").alias("span_start"),
            F.max(pos_col).cast("bigint").alias("span_end"),
        )
        .withColumn(
            "n_tokens", (F.col("span_end") - F.col("span_start") + 1).cast("bigint")
        )
        .withColumn("span_no", F.col("span_no").cast("bigint"))
    )


def bio_decode_sequential(tags: list[int]) -> list[tuple[int, int]]:
    """Executable spec: the reference's sequential walk, tag-only
    (run_e2e_span.py:411-447 minus the `##` subword clause).  Used by
    tests to verify the window formulation; never run at scale."""
    spans: list[tuple[int, int]] = []
    start = end = 0
    found = False
    for j, t in enumerate(tags):
        if t == 1:
            start = end = j
            found = True
        elif t == 2:
            if j == 0 or tags[j - 1] == 0:
                start = end = j
            else:
                end += 1
            found = True
        elif t == 0 and found:
            spans.append((start, end))
            found = False
    if found:
        spans.append((start, end))
    return spans
