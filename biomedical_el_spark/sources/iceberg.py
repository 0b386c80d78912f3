"""Iceberg-backed stage snapshots — the production form of SnapshotStore
(north_star: 'Iceberg-style stage tables', snapshots.py keeps the
parquet+manifest fallback for environments without the runtime).

Everything here is standard Apache Iceberg Spark integration (public
`org.apache.iceberg.spark.SparkCatalog` API): a Hadoop catalog over a
warehouse path, one table per stage, the stage fingerprint recorded as a
TABLE PROPERTY at write time, and resume = "is the committed property
equal to my fingerprint".  Iceberg's atomic metadata swap replaces the
manifest-rename commit protocol of the local store — same
crash-consistency contract, plus time travel and `rewrite_data_files`
compaction for free.

The runtime jars are OPTIONAL (this container has none and no network):
`configure_iceberg` wires the catalog confs onto a SparkSession builder
when `SPARK_GRAFT_ICEBERG_JARS` points at the Iceberg Spark runtime jar;
`iceberg_available` probes the loaded JVM so callers (and the test,
skipped-if-absent) degrade cleanly to the parquet store.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .snapshots import SnapshotStore

CATALOG = "graft"
ICEBERG_JARS_ENV = "SPARK_GRAFT_ICEBERG_JARS"


def iceberg_confs(warehouse: str, jars: str | None = None) -> dict[str, str]:
    """Spark confs for a Hadoop-catalog Iceberg warehouse at `warehouse`.
    Pass to `get_spark(extra_conf=...)` (must be set BEFORE the session
    is created — catalogs are not hot-pluggable)."""
    confs = {
        f"spark.sql.catalog.{CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{CATALOG}.type": "hadoop",
        f"spark.sql.catalog.{CATALOG}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    jars = jars or os.environ.get(ICEBERG_JARS_ENV)
    if jars:
        confs["spark.jars"] = jars
    return confs


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the classpath AND the
    `graft` catalog is configured on this session.  Classpath alone is
    not enough: many distros ship the runtime jars by default, and
    constructing the store against an unconfigured catalog would kill
    the job at CREATE NAMESPACE."""
    try:
        if not spark.conf.get(f"spark.sql.catalog.{CATALOG}", None):
            return False
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergSnapshotStore(SnapshotStore):
    """SnapshotStore over Iceberg tables: one table per stage under
    `graft.<namespace>`, fingerprint committed as a table property in the
    SAME atomic snapshot as the data (`createOrReplace` is one metadata
    swap), `bucket(url)` partitioning on url-keyed stages so downstream
    url-equi-joins read co-located files (SURVEY.md: the features table
    is the one worth bucketing).

    Drop-in for `run_linkage(store=...)`: get_or_compute/committed/read/
    write keep the parent signatures; partition_by accepts plain column
    names (identity partitions) — url gets bucket(16) automatically.
    """

    FP_PROP = "graft.fingerprint"

    def __init__(self, spark: SparkSession, namespace: str = "linkage"):
        # no local root dir: state lives in the catalog
        self.spark = spark
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.{namespace}")

    def _table(self, stage: str) -> str:
        return f"{CATALOG}.{self.namespace}.{stage}"

    def committed(self, stage: str, fp: str) -> bool:
        # `SHOW TBLPROPERTIES` works on v2 catalog tables through Spark's
        # own analyzer (Iceberg exposes no `.properties` metadata table —
        # `<t>$properties` is a Trino feature).  Table-absent is the only
        # expected failure, detected explicitly so real errors (catalog
        # misconfig, permission) surface instead of silently forcing a
        # full recompute of every stage.
        from pyspark.sql.utils import AnalysisException

        try:
            rows = self.spark.sql(
                f"SHOW TBLPROPERTIES {self._table(stage)} ('{self.FP_PROP}')"
            ).collect()
        except AnalysisException:
            return False  # table absent (TABLE_OR_VIEW_NOT_FOUND)
        return bool(rows) and rows[0]["value"] == fp

    def write(
        self,
        df: DataFrame,
        stage: str,
        fp: str,
        partition_by: list[str] | None = None,
    ) -> None:
        from pyspark.sql.functions import bucket, col

        writer = df.writeTo(self._table(stage)).using("iceberg").tableProperty(
            self.FP_PROP, fp
        )
        # DataFrameWriterV2.partitionedBy REPLACES prior partitioning
        # rather than appending — build the transform list and make ONE
        # call so multi-column partition_by keeps every column.
        transforms = [
            bucket(16, col(c)) if c == "url" else col(c)
            for c in (partition_by or [])
        ]
        if transforms:
            writer = writer.partitionedBy(transforms[0], *transforms[1:])
        # one atomic metadata swap commits data + fingerprint together
        writer.createOrReplace()

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.table(self._table(stage))

    def get_or_compute(
        self,
        spark: SparkSession,
        stage: str,
        fp: str,
        compute,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        if self.committed(stage, fp):
            return self.read(spark, stage)
        self.write(compute(), stage, fp, partition_by)
        return self.read(spark, stage)


def open_store(
    spark: SparkSession, root: str, namespace: str | None = None
) -> SnapshotStore | IcebergSnapshotStore | Any:
    """Pick the best available store: Iceberg tables when the runtime is
    loaded AND the catalog configured, the parquet+manifest store
    otherwise.  The Iceberg namespace is derived from `root` so two jobs
    with different --output targets never share (or clobber) stage
    tables."""
    if iceberg_available(spark):
        if namespace is None:
            import hashlib
            import re

            # SAFETY CONTRACT: `root` is user-supplied and the namespace
            # is later interpolated into SQL (committed()/CREATE
            # NAMESPACE).  This slug regex is what keeps that safe —
            # it must stay [A-Za-z0-9_]-only; do not relax it without
            # switching those call sites to parameterized identifiers.
            slug = re.sub(r"[^A-Za-z0-9_]+", "_", root).strip("_")[:40]
            namespace = f"linkage_{slug}_{hashlib.sha256(root.encode()).hexdigest()[:8]}"
        return IcebergSnapshotStore(spark, namespace)
    return SnapshotStore(root)
