"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in rxtls_spark/ — a from-scratch PySpark-native
parse→enrich→route→aggregate engine with the capabilities of
x-stp/rxtls (see SURVEY.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → parse → enrich → route → per-sink counts."""
    from rxtls_spark.pipeline import run_flagship

    return run_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rxtls_spark.queries import _all_queries

    return _all_queries()


def oracle_sql() -> dict[str, str]:
    from rxtls_spark.queries import oracle_sql as _oracle

    return _oracle()
