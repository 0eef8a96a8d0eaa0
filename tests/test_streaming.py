"""Streaming-vs-batch agreement: the streaming pipeline (availableNow
micro-batches over a parquet directory) must produce exactly the batch
pipeline's per-route counts, and restarting from the checkpoint must
not duplicate output (exactly-once)."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Materialize sf0.001 pages as a multi-file parquet dir (the
    streaming source)."""
    from rxtls_spark.datagen.pages import pages_df

    d = str(tmp_path_factory.mktemp("pages_stream"))
    pages_df(spark, SF_SMOKE).repartition(6).write.mode("overwrite").parquet(d)
    return d


def _batch_window_counts(spark, pages_dir):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.pipeline import enriched

    pages = spark.read.parquet(pages_dir)
    df = enriched(pages, log_operators_df(spark))
    return {
        (r["route"], r["window_start"]): (r["n_pages"], r["n_domains"])
        for r in df.groupBy(
            "route", F.window("warc_ts", "1 hour").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.size("all_domains")).alias("n_domains"),
        )
        .select(
            "route",
            F.unix_timestamp("w.start").cast("long").alias("window_start"),
            "n_pages",
            "n_domains",
        )
        .collect()
    }


def test_streaming_equals_batch(spark, pages_dir, tmp_path):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.streaming.pipeline import start_windowed_counts

    out = str(tmp_path / "stream_out")
    # single availableNow batch: with multi-file micro-batches the file
    # order is mtime-arbitrary, so late-vs-watermark drops are
    # nondeterministic — real sources deliver roughly time-ordered data
    q = start_windowed_counts(
        spark, pages_dir, out, log_operators_df(spark), max_files_per_trigger=None
    )
    q.awaitTermination(300)

    got = {
        (r["route"], r["window_start"]): (r["n_pages"], r["n_domains"])
        for r in spark.read.parquet(os.path.join(out, "window_counts")).collect()
    }
    batch = _batch_window_counts(spark, pages_dir)
    # append-mode watermark semantics: windows still open when the
    # bounded stream ends (end > max_event_time - watermark) are
    # correctly withheld; everything emitted must match batch exactly.
    # the watermark lands at max_event_time − 1h, somewhere INSIDE the
    # last window — so windows ending within (watermark, end] stay open;
    # provably-closed ones end ≥ 2 windows before the last window start
    last_ws = max(ws for _, ws in batch)
    closed = {k: v for k, v in batch.items() if k[1] + 3600 <= last_ws - 3600}
    assert got.items() <= batch.items()  # emitted ⊆ batch, values equal
    assert closed.items() <= got.items()  # every closed window emitted
    withheld = set(batch) - set(got)
    assert all(ws + 3600 > last_ws - 3600 for _, ws in withheld), withheld


def test_streaming_restart_is_noop(spark, pages_dir, tmp_path):
    """Rerunning with the same checkpoint must not re-emit rows."""
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.streaming.pipeline import start_windowed_counts

    out = str(tmp_path / "restart_out")
    ops = log_operators_df(spark)
    q1 = start_windowed_counts(spark, pages_dir, out, ops)
    q1.awaitTermination(300)
    n1 = spark.read.parquet(os.path.join(out, "window_counts")).count()
    q2 = start_windowed_counts(spark, pages_dir, out, ops)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(os.path.join(out, "window_counts")).count()
    assert n1 == n2 > 0


def test_foreachbatch_multisink(spark, pages_dir, tmp_path):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.pipeline import enriched
    from rxtls_spark.streaming.pipeline import start_routed_sink

    out = str(tmp_path / "routed_out")
    q = start_routed_sink(spark, pages_dir, out, log_operators_df(spark))
    q.awaitTermination(300)

    routed = spark.read.parquet(os.path.join(out, "routed"))
    batch = enriched(
        spark.read.parquet(pages_dir), log_operators_df(spark)
    )
    assert routed.count() == batch.count()
    # partition dirs exist per (lang, suffix_group)
    langs = {r["lang"] for r in routed.select("lang").distinct().collect()}
    assert len(langs) >= 3


def test_streaming_dedup_first_occurrence_and_restart(spark, tmp_path):
    """Exact-dedup stream: one admission per distinct text across
    micro-batches, duplicate counts right, and a RESTARTED query (same
    checkpoint, new files) keeps rejecting hashes admitted before —
    the state survives the restart."""
    import pandas as pd

    from rxtls_spark.streaming.dedup_stream import dedup_stream

    src = tmp_path / "docs_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            src / f"{name}.parquet"
        )

    # batch 1: A twice (ids 3, 1) and B once
    write_batch("b1", [(3, "text A"), (1, "text A"), (5, "text B")])
    # batch 2: A again (dup), C new
    write_batch("b2", [(7, "text A"), (9, "text C")])

    def run_available_now():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available_now()
    got = {
        r["content_hash"]: (r["doc_id"], r["n_dropped_before"])
        for r in spark.read.parquet(out).collect()
    }
    import hashlib

    h = lambda t: hashlib.md5(t.encode()).hexdigest()
    assert got[h("text A")][0] == 1          # min doc_id of the first batch
    assert got[h("text A")][1] == 1          # its same-batch dup dropped
    assert got[h("text B")] == (5, 0)
    assert got[h("text C")] == (9, 0)
    assert len(got) == 3

    # restart with new files: A must stay rejected, D admitted
    write_batch("b3", [(11, "text A"), (13, "text D")])
    run_available_now()
    after = spark.read.parquet(out).groupBy("content_hash").count().collect()
    assert all(r["count"] == 1 for r in after)  # no re-admission
    rows = {r["content_hash"]: r for r in spark.read.parquet(out).collect()}
    assert rows[h("text D")]["doc_id"] == 13
    assert rows[h("text A")]["doc_id"] == 1    # still the original keeper
    assert len(rows) == 4


def test_streaming_dedup_ttl_evicts_and_readmits(spark, tmp_path):
    """TTL-bounded dedup: within the TTL a duplicate is rejected; after
    the TTL the hash is evicted and the next copy is ADMITTED again —
    the evidence that expired state actually leaves the store.

    Timing note: each availableNow start costs ~10 s of wall clock, so
    the within-TTL check uses a TTL far longer than the test (10 min)
    and the post-TTL check uses a TTL of 1 ms — both deterministic."""
    import hashlib

    import pandas as pd

    from rxtls_spark.streaming.dedup_stream import dedup_stream_ttl

    h = lambda t: hashlib.md5(t.encode()).hexdigest()

    def harness(name, ttl_ms):
        src = tmp_path / f"{name}_src"
        src.mkdir()
        ckpt = str(tmp_path / f"{name}_ckpt")
        out = str(tmp_path / f"{name}_out")

        def write_batch(fname, rows):
            pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
                src / f"{fname}.parquet"
            )

        def run():
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            q = (
                dedup_stream_ttl(stream, ttl_ms=ttl_ms)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        return write_batch, run, out

    # --- within-TTL: duplicates rejected across batches and restarts ---
    write_batch, run, out = harness("long", ttl_ms=600_000)
    write_batch("b1", [(2, "ttl A"), (4, "ttl A"), (6, "ttl B")])
    run()
    write_batch("b2", [(8, "ttl A")])
    run()
    rows = spark.read.parquet(out).collect()
    admitted_a = sorted(r["doc_id"] for r in rows if r["content_hash"] == h("ttl A"))
    assert admitted_a == [2]  # one admission; same-batch + cross-batch dups rejected
    assert [r["n_dropped_before"] for r in rows if r["content_hash"] == h("ttl A")] == [1]

    # --- post-TTL: expired hash evicted, next copy admitted anew ---
    write_batch, run, out = harness("short", ttl_ms=1)
    write_batch("b1", [(2, "ttl A")])
    run()
    write_batch("b2", [(10, "ttl A"), (12, "ttl C")])
    run()
    rows = spark.read.parquet(out).collect()
    admitted_a = sorted(r["doc_id"] for r in rows if r["content_hash"] == h("ttl A"))
    assert admitted_a == [2, 10], admitted_a  # evicted hash admitted anew
    assert [r["doc_id"] for r in rows if r["content_hash"] == h("ttl C")] == [12]
