"""Sink compaction planning — the small-file answer at 100 TB.

The per-key sinks (S6/S7, rxtls_spark/pipeline.py — reference analog
internal/core/domain_extractor.go per-operator CSV sinks) emit one
file per (key, window); at web scale that is millions of KB-sized
files, and the standard fix is a periodic compaction pass that merges
adjacent small files into ~target-size groups.

The PLANNER here is pure window arithmetic — a BYTE-RANGE scheme, not
greedy accumulation: each file goes to group
``floor(cumulative_bytes_before / target)``, i.e. groups are the
fixed ranges [0,T), [T,2T), … of the per-key cumulative byte line.  A
group therefore holds every file whose start offset falls in its
range; a file straddling a boundary lands in the earlier group (so
groups can overshoot by at most one file), and a group whose range is
covered by one big file can close without its own bytes reaching T.
(True greedy packing — accumulate-until-cross with a reset — needs a
sequential recurrence per key; the byte-range rule gives the same
~target-sized groups with ONE exchange and no recursion, and is
value-hash-checkable in plain SQL.)  The EXECUTION of a group is a read of its members +
coalesced rewrite, which is just the existing sink path re-run per
group; what needs an operator (and a correctness gate) is the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def file_inventory(events: DataFrame, row_overhead: int = 32) -> DataFrame:
    """Deterministic per-(event_type, hour) file inventory derived from
    the events table — one logical sink file per partition, bytes
    estimated as sum(row_overhead + octet_length(props)) — UTF-8
    bytes, matching the oracle's strlen and the on-disk cost.  Stands in for the
    manifest's per-file lineage rows (manifest.py A3), which at run
    time supply the same (key, order, bytes) shape."""
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long")
    return events.groupBy(
        F.col("event_type").alias("sink_key"), hour.alias("hour_epoch")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.octet_length("props") + F.lit(row_overhead))
        .cast("long")
        .alias("bytes"),
    )


def compaction_plan(
    inventory: DataFrame,
    target_bytes: int,
    key_col: str = "sink_key",
    order_col: str = "hour_epoch",
) -> DataFrame:
    """Assign each file to a merge group per sink key by the byte-range
    rule (module docstring): group = floor(cumulative_bytes_before /
    target_bytes) over files in ``order_col`` order.  Files are never
    split; a boundary-straddling file belongs to the earlier group, so
    groups overshoot by at most one file.  Adds grp / grp_files /
    grp_bytes columns."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    cum_before = F.sum("bytes").over(w) - F.col("bytes")
    planned = inventory.withColumn(
        "grp", F.floor(cum_before / F.lit(target_bytes)).cast("long")
    )
    wg = Window.partitionBy(key_col, "grp")
    return planned.select(
        key_col,
        order_col,
        "n_rows",
        "bytes",
        "grp",
        F.count(F.lit(1)).over(wg).cast("long").alias("grp_files"),
        F.sum("bytes").over(wg).cast("long").alias("grp_bytes"),
    )
