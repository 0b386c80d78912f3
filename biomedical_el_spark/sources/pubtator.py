"""PubTator-format corpus ingest — the reference's raw input path
re-expressed as Spark reads (SURVEY.md S1/S2, §3.1).

Reference semantics (data_preprocessing.py):
  - line format `docid|t|title` / `docid|a|abstract` (regex `^\\d+\\|[at]\\|`,
    :17) → documents; title+abstract concatenated with ' ' (:38-43)
  - 6-col TSV mention lines `(doc, start, end, text, type, concept_id)`
    (:46-64); skip concept `-1` (:48-49, operator P1); composite concept
    ids split on `+`/`|`, first id kept (:65-68, P2)
  - span sanity `0 ≤ start < end` (:57-59, P3)

Spark restatement: one `spark.read.text` scan, regex routing into both
relations, order-stable group-concat (A1) — all JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DOC_RE = r"^(\d+)\|([at])\|(.*)$"


def read_pubtator(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """path (text file(s)) → (documents, mentions).

    documents: (doc_id string, text string) — title + ' ' + abstract.
    mentions:  (doc_id, start_index, end_index, text, type,
                label_candidate_id) — P1/P2/P3 applied.
    """
    lines = spark.read.text(path)

    doc_lines = lines.filter(F.col("value").rlike(_DOC_RE)).select(
        F.regexp_extract("value", _DOC_RE, 1).alias("doc_id"),
        F.regexp_extract("value", _DOC_RE, 2).alias("part"),
        F.regexp_extract("value", _DOC_RE, 3).alias("text"),
    )
    # order-stable concat: 't' < 'a' by sort key (title first, as the
    # reference concatenates title + ' ' + abstract)
    documents = (
        doc_lines.withColumn("ord", F.when(F.col("part") == "t", 0).otherwise(1))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
    )

    cols = F.split(F.col("value"), "\t")
    mentions = (
        lines.filter(~F.col("value").rlike(_DOC_RE))
        .filter(F.size(cols) >= 6)
        .select(
            cols[0].alias("doc_id"),
            cols[1].cast("int").alias("start_index"),
            cols[2].cast("int").alias("end_index"),
            cols[3].alias("text"),
            cols[4].alias("type"),
            cols[5].alias("concept_raw"),
        )
        # P1: drop unknown concepts
        .filter(F.col("concept_raw") != "-1")
        # P2: composite id → first id (split on + or |)
        .withColumn(
            "label_candidate_id", F.split(F.col("concept_raw"), r"[+|]")[0]
        )
        # P3: span validity
        .filter((F.col("start_index") >= 0) & (F.col("start_index") < F.col("end_index")))
        .drop("concept_raw")
    )
    return documents, mentions


def read_entity_dictionary(spark: SparkSession, path: str) -> DataFrame:
    """Entity dictionary TSV (utils_e2e_span.py:12-32): 2-col `id\\tname`
    (BC5CDR) or 3-col `id\\t_\\tname` → (entity_id, name).  Small dim
    table — broadcast-joinable."""
    cols = F.split(F.col("value"), "\t")
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            cols[0].alias("entity_id"),
            F.when(F.size(cols) >= 3, cols[2]).otherwise(cols[1]).alias("name"),
        )
    )
