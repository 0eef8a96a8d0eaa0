"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.9 extension; the driver mandate's
"custom stateful operators" surface).

Per user_id, events within ``gap_s`` of each other belong to one
session; a session closes when the event-time watermark passes its last
event + gap.  State per key: (session_start, last_ts, n_events).
Closed sessions are emitted with their stats; state for a key is
dropped on timeout — bounded memory regardless of key cardinality,
which is what makes this shape viable on an unbounded 10^12-event
stream.

Batch equivalence: tests compare the availableNow run against the
lag+cumsum batch sessionization (queries_relational.q_event_sessions
logic) on the same input — closed sessions must match exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_S = 1800

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("duration_s", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit closed sessions for one user key."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _session_row(user_id, start_us, last_us, n)
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(v.value // 1_000) for v in pdf["ts"])
    ts_us.sort()

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = 0, 0, 0

    closed = []
    for t in ts_us:
        if n == 0:
            start_us, last_us, n = t, t, 1
        elif t - last_us > GAP_S * 1_000_000:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            # late-but-within-gap events extend the open session
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n += 1

    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + GAP_S * 1000)  # us -> ms epoch
    for s, e, cnt in closed:
        yield _session_row(user_id, s, e, cnt)


def _session_row(user_id: int, start_us: int, last_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "duration_s": [(last_us - start_us) // 1_000_000],
        }
    )


def sessionize_stream(events_stream, watermark: str = "30 minutes"):
    """events (user_id, ts, ...) stream → closed-session stream."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
