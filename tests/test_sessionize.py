"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch lag+cumsum sessionization — closed sessions must agree."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def _batch_sessions(spark, events_dir):
    """lag + cumsum gap sessionization (the q_event_sessions core)."""
    e = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return {
        (r["user_id"], r["start"].isoformat()): (r["n"], r["end"].isoformat())
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }


def test_stateful_sessionize_matches_batch(spark, events_dir, tmp_path):
    from rxtls_spark.streaming.sessionize import sessionize_stream

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .format("parquet")
        .load(events_dir)
    )
    out = str(tmp_path / "sessions")
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"].isoformat()): (
            r["n_events"],
            r["session_end"].isoformat(),
        )
        for r in spark.read.parquet(out).collect()
    }
    batch = _batch_sessions(spark, events_dir)
    # the stream emits sessions closed by gap or by final timeout;
    # sessions still open at watermark end are withheld — everything
    # emitted must match batch exactly
    assert got, "stream emitted no sessions"
    for k, v in got.items():
        assert batch.get(k) == v, k
    # the vast majority of sessions close (30-day span vs 30-min gap)
    assert len(got) >= 0.8 * len(batch)
