"""TableIO seam: Iceberg when a catalog is configured, parquet paths otherwise.

The production design targets Iceberg tables (`spark.read.format("iceberg")`
/ `df.writeTo(tbl).append()`, sinks partitioned by days(warc_ts)); this
sandbox has no Iceberg runtime jar and no network, so the seam falls back to
schema-identical parquet directories with the same write semantics
(append / dynamic overwrite). Activate Iceberg via
`--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13` plus a
catalog conf; call sites do not change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Read/write seam. `location` is a catalog namespace (Iceberg) or a
    base directory (parquet).

    The backend is EXPLICIT — `backend="parquet"` (default) or
    `backend="iceberg"`, or the scheme prefix `iceberg:<namespace>` in the
    location. No inference from path shape + classpath: a relative output
    directory must never silently become catalog table writes."""

    def __init__(self, spark: SparkSession, location: str, backend: str = "parquet"):
        self.spark = spark
        if location.startswith("iceberg:"):
            backend = "iceberg"
            location = location[len("iceberg:"):]
        if backend not in ("parquet", "iceberg"):
            raise ValueError(f"unknown TableIO backend: {backend!r}")
        if backend == "iceberg" and not _iceberg_available(spark):
            raise ValueError(
                "iceberg backend requested but no Iceberg runtime on the "
                "classpath (add --packages org.apache.iceberg:iceberg-spark-runtime)"
            )
        self.location = location
        self.backend = backend
        self.use_iceberg = backend == "iceberg"

    def _target(self, table: str) -> str:
        if self.use_iceberg:
            return f"{self.location}.{table}"
        return os.path.join(self.location, table)

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(self._target(table))
        return self.spark.read.parquet(self._target(table))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            df.writeTo(self._target(table)).append()
            return
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._target(table))

    def overwrite(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> None:
        if self.use_iceberg:
            df.writeTo(self._target(table)).createOrReplace()
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._target(table))

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._target(table))
        return os.path.exists(self._target(table))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    buckets: int,
    bucket_col: str,
    sort_col: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table write — the co-located-join layout:
    two tables bucketed by the same key into the same bucket count join
    WITHOUT an Exchange (each bucket pair is joined in place), which at
    100 TB removes the dominant shuffle from repeated fact-to-fact joins.

    Spark native bucketing requires the table catalog (saveAsTable); the
    explicit path keeps the data external so the parquet files live next
    to the rest of the namespace. Iceberg's equivalent is a bucket(n, col)
    partition transform — same call shape when the catalog is configured.
    """
    writer = df.write.mode("overwrite").option("path", path).bucketBy(
        buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)
