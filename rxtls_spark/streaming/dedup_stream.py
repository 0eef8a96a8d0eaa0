"""Streaming exact-dedup — first-occurrence filter with keyed state.

The batch dedup suite (operators/dedup.py) assumes the corpus is at
rest; a crawl pipeline sees documents ARRIVE, and must admit the first
copy of each content hash and drop every later one, across micro-batch
boundaries and across restarts.  ``applyInPandasWithState`` keyed by
content hash holds one tiny record per distinct hash (seen count); the
streaming checkpoint persists it, so a restarted query keeps rejecting
hashes admitted before the crash — exactly-once admission.

Two variants:
- `dedup_stream` — exact forever-dedup; state grows one record per
  DISTINCT document, the inherent cost of exact semantics.  On a
  cluster back the state store with RocksDB
  (`spark.sql.streaming.stateStore.providerClass`) so state spills to
  disk.
- `dedup_stream_ttl` — the always-on shape: state carries a
  processing-time TTL, expired hashes are evicted (and re-admitted on
  next sight), so state is bounded by distinct-hashes-per-window.
For bounded-state NEAR-dedup, window the stream and run the batch
MinHash path per window instead.
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


# ---------------------------------------------------------------------------
# TTL-bounded variant — the always-on shape
# ---------------------------------------------------------------------------

DEDUP_TTL_STATE_SCHEMA = StructType(
    [StructField("seen", LongType()), StructField("expire_at_ms", LongType())]
)


def make_dedup_ttl_fn(ttl_ms: int):
    """Keyed-state function with a processing-time TTL.

    The unbounded variant above is correct for exact dedup at rest but
    its state grows one record per distinct hash forever — an infinite
    stream eventually exhausts even a RocksDB-backed store.  This
    variant bounds state with the standard trade: a hash unseen for
    ``ttl_ms`` is EVICTED (GroupStateTimeout fires → state.remove()),
    so a copy arriving after expiry is admitted again.  That converts
    exact dedup into sliding-window dedup, which is what an always-on
    crawl pipeline actually wants (re-crawls of a page a year later are
    usually re-admitted deliberately).

    Eviction is belt-and-braces: the stored ``expire_at_ms`` deadline
    is checked on the data path too, because a processing-time timeout
    only fires for groups with NO data in the micro-batch — a duplicate
    arriving after expiry but before the GC pass must still re-admit.
    """

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # GC pass: no data for this key this batch
            return
        (content_hash,) = key
        now = state.getCurrentProcessingTimeMs()
        n = 0
        first_id = None
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                m = int(pdf["doc_id"].min())
                first_id = m if first_id is None else min(first_id, m)
        if state.exists:
            seen, expire_at = state.get
            if now < expire_at:
                # still within TTL: reject, keep the ORIGINAL deadline
                # (fixed window per admission, not sliding — a trickle
                # of duplicates must not pin state alive forever)
                state.update((seen + n, expire_at))
                state.setTimeoutDuration(max(1, expire_at - now))
                return
            # expired but not yet GC'd → fall through to re-admission
        state.update((n, now + ttl_ms))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "doc_id": [first_id],
                "n_dropped_before": [n - 1],
            }
        )

    return fn


def dedup_stream_ttl(
    docs_stream: DataFrame, text_col: str = "text", ttl_ms: int = 3_600_000
) -> DataFrame:
    """documents stream → first occurrence per md5(text) within each
    ``ttl_ms`` processing-time window.  State size is bounded by the
    number of distinct hashes seen per TTL window instead of ever."""
    hashed = docs_stream.select(
        "doc_id", F.md5(F.col(text_col)).alias("content_hash")
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        make_dedup_ttl_fn(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
