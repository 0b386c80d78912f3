"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship linkage pipeline over sf0.001 documents.
queries()         — one entry per implemented operator (SURVEY.md §2 +
                    training-data-pipeline extras), from plans/catalog.py.
oracle_sql()      — matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full ER pipeline (blocking → pairwise scoring →
    transitive clustering) over the sf0.001 documents table treated as the
    pages corpus.  Returns the clusters DataFrame (node, component)."""
    from biomedical_el_spark.plans.linkage import LinkageConfig, run_linkage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"), F.col("text")
    )
    out = run_linkage(spark, pages, cfg=LinkageConfig())
    return out["clusters"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from biomedical_el_spark.plans import catalog

    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    from biomedical_el_spark.plans import catalog

    return dict(catalog.ORACLES)
