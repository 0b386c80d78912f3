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


def bio_decode_sequential_subword(tags: list[int], cont: list[int]) -> list[tuple[int, int]]:
    """Executable spec: the reference's FULL sequential walk INCLUDING the
    WordPiece `##` continuation clause (run_e2e_span.py:411-447 verbatim
    semantics over complete token sequences with [CLS] at 0 and [SEP] at
    L-1; `cont[k]`=1 marks a `##` continuation token).

    Faithful quirks preserved: (a) the reference's inner `j += 1` is dead
    (it mutates the for-loop variable), so continuation tokens are BOTH
    absorbed into `end_index` and re-processed with their own tags —
    extensions double-count; (b) `start_index`/`end_index` initialize to
    0, so a tag-2 at position 1 under a non-O [CLS] tag anchors a span at
    the never-visited position 0.  Used by tests to verify the window
    formulation; never run at scale."""
    L = len(tags)
    spans: list[tuple[int, int]] = []
    start = end = 0
    found = False
    for j in range(1, L - 1):
        if tags[j] == 1:
            start = j
            end = j
            for k in range(j + 1, L - 1):
                if cont[k]:
                    end += 1
                else:
                    break
            found = True
        elif tags[j] == 2:
            if tags[j - 1] == 0:
                start = j
                end = j
            else:
                end += 1
            for k in range(j + 1, L - 1):
                if cont[k]:
                    end += 1
                else:
                    break
            found = True
        elif tags[j] == 0 and found:
            spans.append((start, end))
            found = False
    if found:
        spans.append((start, end))
    return spans


def bio_span_decode_subword(
    tagged: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    tag_col: str = "tag",
    cont_col: str = "cont",
) -> DataFrame:
    """W4 with the reference's `##` subword clause, as a CLOSED FORM —
    no per-document loop (proved against `bio_decode_sequential_subword`
    exhaustively over every (tags, cont) pair of length ≤ 6 in
    tests/test_bio.py).

    Derivation (run = maximal non-O tag segment within positions
    1..L-2): let c(j) = length of the maximal `##` streak starting at
    j+1 (bounded to positions ≤ L-2), C(j) its prefix sum, p0/pk the
    run's ends, lastB its last tag-1 position.  The sequential walk
    collapses to exactly one span per run with

        s'    = lastB if the run has a B else p0
        start = lastB if it exists,
                else 0 if (p0 == 1 and tag[0] != 0)   [stale-anchor]
                else p0
        end   = pk + ( C(pk) - C(s') + c(s') )

    because every B resets end to j + c(j) and every subsequent in-run
    tag-2 adds 1 + c(j) — so the c's telescope into a prefix-sum
    difference.  Plan shape: ONE hash exchange on id_col shared by all
    windows + the final aggregate; c(j) comes from a gaps-and-islands
    pass over the continuation rows (no joins wider than the doc's own
    rows).  Fully DuckDB-oracle-checkable (`w_bio_decode_subword`)."""
    w_doc = Window.partitionBy(id_col)
    w_ord = w_doc.orderBy(pos_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)

    base = (
        tagged.withColumn("_L", F.max(pos_col).over(w_doc) + 1)
        .withColumn("_tag0", F.first(tag_col).over(w_ord))
    )
    # islands of consecutive cont=1 positions (bounded to pos <= L-2):
    # island key = pos - rank among the doc's cont rows; island_end = max
    conts = (
        base.filter((F.col(cont_col) == 1) & (F.col(pos_col) <= F.col("_L") - 2))
        .withColumn(
            "_isl",
            F.col(pos_col)
            - F.row_number().over(Window.partitionBy(id_col).orderBy(pos_col)),
        )
        .withColumn(
            "_isl_end", F.max(pos_col).over(Window.partitionBy(id_col, "_isl"))
        )
        .select(
            F.col(id_col).alias("_cid"),
            (F.col(pos_col) - 1).alias("_prev_pos"),
            (F.col("_isl_end") - F.col(pos_col) + 1).alias("_c"),
        )
    )
    rows = base.join(
        conts,
        (F.col(id_col) == F.col("_cid")) & (F.col(pos_col) == F.col("_prev_pos")),
        "left",
    ).drop("_cid", "_prev_pos").withColumn("_c", F.coalesce("_c", F.lit(0)))
    rows = rows.withColumn("_csum", F.sum("_c").over(w_cum))

    interior = rows.filter(
        (F.col(pos_col) >= 1) & (F.col(pos_col) <= F.col("_L") - 2)
    )
    is_o = (F.col(tag_col) == 0).cast("int")
    runs = interior.withColumn("span_no", F.sum(is_o).over(w_cum)).filter(
        F.col(tag_col) != 0
    )
    g = runs.groupBy(id_col, "span_no").agg(
        F.min(pos_col).alias("_p0"),
        F.max(pos_col).alias("_pk"),
        F.max(F.when(F.col(tag_col) == 1, F.col(pos_col))).alias("_lastB"),
        # (c, C) at the anchor rows, fetched via deterministic struct-max
        F.max(F.when(F.col(tag_col) == 1, F.struct(pos_col, "_c", "_csum"))).alias("_bRow"),
        F.min(F.struct(pos_col, "_c", "_csum")).alias("_fRow"),
        F.max(F.struct(pos_col, "_csum")).alias("_kRow"),
        F.first("_tag0").alias("_t0"),
    )
    anchor_c = F.coalesce(F.col("_bRow._c"), F.col("_fRow._c"))
    anchor_C = F.coalesce(F.col("_bRow._csum"), F.col("_fRow._csum"))
    stale = F.col("_lastB").isNull() & (F.col("_p0") == 1) & (F.col("_t0") != 0)
    start = F.coalesce(
        F.col("_lastB"), F.when(stale, F.lit(0)).otherwise(F.col("_p0"))
    )
    end = F.col("_pk") + (F.col("_kRow._csum") - anchor_C + anchor_c)
    return g.select(
        F.col(id_col),
        F.col("span_no").cast("bigint").alias("span_no"),
        start.cast("bigint").alias("span_start"),
        end.cast("bigint").alias("span_end"),
        (end - start + 1).cast("bigint").alias("n_tokens"),
    )
