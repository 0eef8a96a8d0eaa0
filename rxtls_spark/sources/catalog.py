"""Catalog sources — the log-list scan family (SURVEY §2.1 S1-S3, S12).

The reference loads a CT log-list JSON trying the V3 shape first and
falling back to V2 (/root/reference/internal/certlib/api.go:108-158,
175-220) — schema-on-read with versioned fallback.  Here that is two
explicit StructTypes + try-in-order on the same file, then the same
normalization chain: URL cleaning (P2, api.go:223-232), usability
filter (P1, api.go:235-244), operator-name enrichment (J1,
api.go:249-262).

``write_log_list_fixture`` emits a synthetic list in either shape from
the spec constants (21 operators / 175 logs, the all_logs_list.json
cardinality) so both paths are testable without network.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rxtls_spark import spec

# V3: operators own their logs
V3_SCHEMA = StructType(
    [
        StructField(
            "operators",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField(
                            "logs",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("url", StringType()),
                                        StructField("description", StringType()),
                                        StructField("state", StringType()),
                                        StructField("tree_size", LongType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

# V2: flat logs list + operator id map
V2_SCHEMA = StructType(
    [
        StructField(
            "logs",
            ArrayType(
                StructType(
                    [
                        StructField("url", StringType()),
                        StructField("description", StringType()),
                        StructField("state", StringType()),
                        StructField("tree_size", LongType()),
                        StructField("operated_by", ArrayType(IntegerType())),
                    ]
                )
            ),
        ),
        StructField(
            "operators",
            ArrayType(
                StructType(
                    [
                        StructField("id", IntegerType()),
                        StructField("name", StringType()),
                    ]
                )
            ),
        ),
    ]
)

N_LOGS = 175  # all_logs_list.json cardinality


def write_log_list_fixture(path: str, version: int = 3) -> None:
    """Synthetic log list, 21 operators × ~8-9 logs = 175 logs."""
    logs = []
    for i in range(N_LOGS):
        op = i % 21 + 1
        state = spec.OPERATOR_STATES.get(op, "usable")
        logs.append(
            {
                "url": f"https://ct{i}.{spec.issuer_cn_for_op(op)}/log/",
                "description": f"{spec.OPERATOR_NAMES[op - 1]} log {i}",
                "state": state,
                "tree_size": 0 if i % 25 == 7 else 1000 + i * 997,
                "op": op,
            }
        )
    if version == 3:
        doc = {
            "operators": [
                {
                    "name": spec.OPERATOR_NAMES[op - 1],
                    "logs": [
                        {k: v for k, v in lg.items() if k != "op"}
                        for lg in logs
                        if lg["op"] == op
                    ],
                }
                for op in range(1, 22)
            ]
        }
    else:
        doc = {
            "logs": [
                {**{k: v for k, v in lg.items() if k != "op"},
                 "operated_by": [lg["op"]]}
                for lg in logs
            ],
            "operators": [
                {"id": op, "name": spec.OPERATOR_NAMES[op - 1]}
                for op in range(1, 22)
            ],
        }
    with open(path, "w") as f:
        json.dump(doc, f)


def clean_log_url(col):
    """Strip scheme + trailing slashes (P2, api.go:223-232)."""
    return F.regexp_replace(
        F.regexp_replace(col, r"^https?://", ""), r"/+$", ""
    )


def _load_v3(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(V3_SCHEMA).option("multiLine", True).json(path)
    op = raw.select(F.explode("operators").alias("op"))
    return op.select(
        F.col("op.name").alias("operator_name"),
        F.explode("op.logs").alias("log"),
    ).select(
        "operator_name",
        clean_log_url(F.col("log.url")).alias("url"),
        F.col("log.description").alias("description"),
        F.col("log.state").alias("state"),
        F.col("log.tree_size").alias("tree_size"),
    )


def _load_v2(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(V2_SCHEMA).option("multiLine", True).json(path)
    ops = raw.select(F.explode("operators").alias("o")).select(
        F.col("o.id").alias("op_id"), F.col("o.name").alias("operator_name")
    )
    logs = raw.select(F.explode("logs").alias("log")).select(
        clean_log_url(F.col("log.url")).alias("url"),
        F.col("log.description").alias("description"),
        F.col("log.state").alias("state"),
        F.col("log.tree_size").alias("tree_size"),
        F.element_at(F.col("log.operated_by"), 1).alias("op_id"),
    )
    # J1: operator-id → name enrichment; unknown id → '' (api.go:259-262)
    return logs.join(F.broadcast(ops), "op_id", "left").select(
        F.coalesce("operator_name", F.lit("")).alias("operator_name"),
        "url",
        "description",
        "state",
        "tree_size",
    )


def load_log_list(spark: SparkSession, path: str) -> DataFrame:
    """V3-first, V2-fallback schema-on-read (F14, api.go:108-158).

    A V2 file parsed with the V3 schema yields operators with null
    logs (and vice-versa yields null operator names) — the fallback
    triggers on an empty/degenerate result, like the reference's
    unmarshal-error fallback."""
    v3 = _load_v3(spark, path)
    if v3.where(F.col("url").isNotNull()).limit(1).count() > 0:
        return v3
    return _load_v2(spark, path)


def usable_logs(catalog: DataFrame) -> DataFrame:
    """P1 + P4: drop rejected/retired/test states and empty logs."""
    return catalog.where(
        ~F.col("state").isin("rejected", "retired", "test")
        & (F.col("tree_size") > 0)
    )


def select_logs(catalog: DataFrame, requested: DataFrame) -> DataFrame:
    """P3/J2: semi-join the catalog against a requested-URL set; the
    anti side is the unknown-key detection (main.go:433-486)."""
    req = requested.select(clean_log_url(F.col("url")).alias("url"))
    return catalog.join(F.broadcast(req), "url", "left_semi")


def unknown_requests(catalog: DataFrame, requested: DataFrame) -> DataFrame:
    req = requested.select(clean_log_url(F.col("url")).alias("url"))
    return req.join(F.broadcast(catalog.select("url")), "url", "left_anti")


def sanitize_filename(col):
    """F13 (util/filename.go:49-72): map / \\ : * ? " < > | → _ and
    truncate to 100 chars."""
    return F.substring(
        F.regexp_replace(col, r'[/\\:*?"<>|]', "_"), 1, 100
    )
