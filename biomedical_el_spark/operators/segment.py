"""Document segmentation — the reference's greedy chunker (SURVEY.md
§3.1 step 2; data_preprocessing.py:85-174) restated for Spark.

Reference semantics: walk a document's mentions in offset order,
accumulating text; close a segment when it would exceed
`max_mentions` (=8, :99) mentions or `max_tokens` (<256, :106) tokens;
segment ids are `docid_segN`; mention offsets re-based to the segment
(:119-120,156-157); mentions that no longer fit are DROPPED and counted
(`omitted_mentions`, :121-124,159-162 — reported, never silent).

Split into the two natural Spark pieces:
  1. the inherently-sequential per-document walk → `applyInPandas` over
     groupBy(doc_id): plain Python over ONE doc's few mentions, thousands
     of docs in parallel;
  2. mention→segment assignment → a range join on char offsets (J6
     family) + anti-join for the omitted count — set algebra, not loops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEG_SCHEMA = (
    "doc_id string, segment_id string, seg_start long, seg_end long, "
    "text string, n_tokens int"
)


def segment_documents(
    documents: DataFrame,
    mentions: DataFrame,
    max_mentions: int = 8,
    max_tokens: int = 256,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (segments, segment_mentions, omitted_mentions).

    segments: SEG_SCHEMA; segment_mentions: mention cols rebased to the
    segment + segment_id; omitted_mentions: input mentions that crossed a
    segment boundary (the reference's omitted count).
    """
    joined = documents.select(
        "doc_id", F.col("text").alias("doc_text")
    ).join(
        mentions.select("doc_id", "start_index", "end_index"),
        "doc_id",
        "left",
    )

    def chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        doc_text = pdf["doc_text"].iloc[0] or ""
        ms = (
            pdf.dropna(subset=["start_index"])
            .sort_values(["start_index", "end_index"])
            .reset_index(drop=True)
        )
        rows = []
        seg_no, seg_start = 0, 0
        n_in_seg = 0

        def flush(end: int):
            nonlocal seg_no, seg_start, n_in_seg
            text = doc_text[seg_start:end]
            rows.append(
                dict(
                    doc_id=doc_id,
                    segment_id=f"{doc_id}_{seg_no}",
                    seg_start=seg_start,
                    seg_end=end,
                    text=text,
                    n_tokens=len(text.split()),
                )
            )
            seg_no += 1
            seg_start = end
            n_in_seg = 0

        for _, m in ms.iterrows():
            end_here = int(m["end_index"])
            prospective_tokens = len(doc_text[seg_start:end_here].split())
            if n_in_seg > 0 and (
                n_in_seg >= max_mentions or prospective_tokens >= max_tokens
            ):
                flush(int(m["start_index"]))
            n_in_seg += 1
        flush(len(doc_text))
        return pd.DataFrame(rows)

    segments = joined.groupBy("doc_id").applyInPandas(chunk, schema=SEG_SCHEMA)

    # mention → containing segment: range join on char offsets (J6)
    seg_narrow = segments.select("doc_id", "segment_id", "seg_start", "seg_end")
    assigned = mentions.join(
        seg_narrow,
        (mentions["doc_id"] == seg_narrow["doc_id"])
        & (mentions["start_index"] >= seg_narrow["seg_start"])
        & (mentions["end_index"] <= seg_narrow["seg_end"]),
    ).select(
        "segment_id",
        (F.col("start_index") - F.col("seg_start")).cast("int").alias("start_index"),
        (F.col("end_index") - F.col("seg_start")).cast("int").alias("end_index"),
        mentions["text"],
        mentions["type"],
        mentions["label_candidate_id"],
    )

    # omitted = mentions not contained in any segment (boundary-crossers)
    contained = mentions.join(
        seg_narrow,
        (mentions["doc_id"] == seg_narrow["doc_id"])
        & (mentions["start_index"] >= seg_narrow["seg_start"])
        & (mentions["end_index"] <= seg_narrow["seg_end"]),
    ).select(
        mentions["doc_id"].alias("doc_id"),
        mentions["start_index"].alias("start_index"),
        mentions["end_index"].alias("end_index"),
    )
    omitted = mentions.join(
        contained, ["doc_id", "start_index", "end_index"], "left_anti"
    )
    return segments, assigned, omitted
