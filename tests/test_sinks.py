"""Sink abstraction tests (parquet branch; the Iceberg branch needs the
runtime jar, absent in this container — capability probe asserted)."""

import os

import pandas as pd
import pytest


def test_snapshot_row_count_from_footers(tmp_path):
    from rxtls_spark.sources.sinks import snapshot_row_count

    d = tmp_path / "tbl" / "lang=en"
    d.mkdir(parents=True)
    pd.DataFrame({"a": range(100)}).to_parquet(d / "part-0.parquet")
    pd.DataFrame({"a": range(37)}).to_parquet(d / "part-1.parquet")
    # metadata-only count — no scan, no Spark session (S4 analog)
    assert snapshot_row_count(None, str(tmp_path / "tbl")) == 137


def test_iceberg_probe_is_false_here(spark):
    from rxtls_spark.sources.sinks import iceberg_available

    assert iceberg_available(spark) is False


def test_write_routed_table_parquet_fallback(spark, tmp_path):
    from rxtls_spark.sources.sinks import snapshot_row_count, write_routed_table

    df = spark.createDataFrame(
        [(f"u{i}", "en" if i % 2 else "de", "gtld") for i in range(20)],
        "url string, lang string, suffix_group string",
    )
    target = str(tmp_path / "routed_tbl")
    fmt = write_routed_table(df, target)
    assert fmt == "parquet"
    assert snapshot_row_count(spark, target) == 20
    assert os.path.isdir(os.path.join(target, "lang=en"))


def test_manifest_failure_gate(spark, tmp_path):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.manifest import CheckpointedPipeline

    cp = CheckpointedPipeline(str(tmp_path / "gate"), n_buckets=2)
    s = cp.run(
        spark, pages_df(spark, "/root/testdata/sf0.001"), log_operators_df(spark)
    )
    # ~2% malformed by construction → rate recorded, 10% gate passes
    assert 0.01 < s["failure_rate"] < 0.03
    assert s["failure_gate_ok"] is True


def _find_iceberg_jar():
    """The iceberg-spark-runtime jar, if anyone has vendored it.

    This sandbox has no network (DNS + maven-central probes fail, see
    COVERAGE.md §2.9), so the jar cannot be fetched here; the test
    below runs in full the moment a jar lands in jars/ or SPARK_HOME."""
    import glob

    import pyspark

    spots = [
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "jars"),
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.environ.get("SPARK_HOME", "") + "/jars",
    ]
    for d in spots:
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


@pytest.mark.skipif(
    _find_iceberg_jar() is None,
    reason="iceberg-spark-runtime jar not vendored (no network in sandbox)",
)
def test_iceberg_write_and_snapshot_count(tmp_path):
    """Full Iceberg branch: write_routed_table -> iceberg format,
    snapshot_row_count from snapshot summary metadata (no scan)."""
    from pyspark.sql import SparkSession

    from rxtls_spark.sources.sinks import snapshot_row_count, write_routed_table

    warehouse = str(tmp_path / "warehouse")
    s = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-test")
        .config("spark.jars", _find_iceberg_jar())
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", warehouse)
        .getOrCreate()
    )
    try:
        df = s.createDataFrame(
            [(f"u{i}", "en" if i % 2 else "de", "gtld") for i in range(20)],
            "url string, lang string, suffix_group string",
        )
        fmt = write_routed_table(df, "lake.db.routed")
        assert fmt == "iceberg"
        assert snapshot_row_count(s, "lake.db.routed") == 20
        # append commits a second snapshot; count follows the latest
        fmt = write_routed_table(df, "lake.db.routed", mode="append")
        assert snapshot_row_count(s, "lake.db.routed") == 40
    finally:
        s.stop()
