"""Enrichment lookup tables (FIXTURES.md §2).

Analogs of the CT log catalog: ``log_operators`` (21 operators with a
state machine filtered per /root/reference/internal/certlib/
api.go:235-244 and an id→name map joined per api.go:249-262) and
``tld_suffixes`` (the route-key lookup; the reference's route key is
the per-log sink map, domain_extractor.go:618-629).

Both are tiny → always the **broadcast** side of their joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rxtls_spark import spec

USABLE_STATES = ("usable", "readonly", "pending")  # api.go:235-244


def log_operators_rows() -> list[tuple[int, str, str, str]]:
    rows = []
    for op in range(1, 22):
        state = spec.OPERATOR_STATES.get(op, "usable")
        rows.append(
            (op, spec.OPERATOR_NAMES[op - 1], spec.issuer_cn_for_op(op), state)
        )
    return rows


def log_operators_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        log_operators_rows(),
        "operator_id int, operator_name string, host_pattern string, state string",
    )


def tld_suffixes_rows() -> list[tuple[str, str]]:
    rows = list(spec.SUFFIX_GROUPS.items()) + list(spec.EXTRA_SUFFIXES.items())
    return [(s, g) for s, g in rows]


def tld_suffixes_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        tld_suffixes_rows(), "suffix string, suffix_group string"
    )
