"""Streaming exact-dedup — first-occurrence filter with keyed state.

The batch dedup suite (operators/dedup.py) assumes the corpus is at
rest; a crawl pipeline sees documents ARRIVE, and must admit the first
copy of each content hash and drop every later one, across micro-batch
boundaries and across restarts.  ``applyInPandasWithState`` keyed by
content hash holds one tiny record per distinct hash (seen count); the
streaming checkpoint persists it, so a restarted query keeps rejecting
hashes admitted before the crash — exactly-once admission.

State growth is one record per DISTINCT document — the inherent cost of
exact dedup (there is nothing to expire: a hash seen a year ago must
still dedup today).  On a cluster back the state store with RocksDB
(`spark.sql.streaming.stateStore.providerClass`) so state spills to
disk; the in-memory provider is fine for tests.  For bounded-state
near-dedup, window the stream and use the batch MinHash path per
window instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_dropped_before", LongType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def dedup_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Admit the first doc per content hash (min doc_id within the
    batch — deterministic under task retries), drop the rest forever."""
    (content_hash,) = key
    n = 0
    first_id = None
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            first_id = m if first_id is None else min(first_id, m)
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return  # all duplicates of an already-admitted doc
    state.update((n,))
    yield pd.DataFrame(
        {
            "content_hash": [content_hash],
            "doc_id": [first_id],
            "n_dropped_before": [n - 1],
        }
    )


def dedup_stream(docs_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """documents stream → first occurrence per md5(text).

    Output: (content_hash, doc_id of the admitted copy, how many
    same-batch duplicates were dropped with it)."""
    hashed = docs_stream.select(
        "doc_id", F.md5(F.col(text_col)).alias("content_hash")
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",  # each admission is emitted exactly once
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
