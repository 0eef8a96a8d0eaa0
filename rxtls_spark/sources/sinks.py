"""Sink abstraction — Iceberg when available, parquet otherwise.

The north rule targets Iceberg tables (atomic snapshot commits replace
the reference's temp+rename protocol, SURVEY S8).  This sandbox has no
iceberg-spark runtime jar, so the committed path is parquet via Spark's
output committer (also atomic at directory level); the Iceberg branch
is exercised automatically when the runtime is on the classpath — the
writer API below is the only place that knows the difference.

On a real cluster, ship with:
  spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
  spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
  spark.sql.catalog.lake.type=hadoop
  spark.sql.catalog.lake.warehouse=<path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_routed_table(
    df: DataFrame,
    target: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write a routed table; returns the format used.

    ``target`` is an Iceberg table identifier (``catalog.db.tbl``) when
    the runtime exists, else a filesystem path for parquet."""
    spark = df.sparkSession
    partition_cols = partition_cols or ["lang", "suffix_group"]
    if iceberg_available(spark) and "/" not in target:
        w = df.writeTo(target).using("iceberg")
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return "iceberg"
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(target)
    )
    return "parquet"


def snapshot_row_count(spark: SparkSession, target: str) -> int:
    """S4 analog: source size from table metadata, not a scan —
    Iceberg snapshot summary when available, parquet footers otherwise."""
    if iceberg_available(spark) and "/" not in target:
        row = spark.sql(
            f"SELECT summary['total-records'] AS n FROM {target}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0]["n"]) if row else 0
    import os

    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, names in os.walk(target):
        for name in names:
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
    return total
