"""Streaming count-min sketch: batch==stream cell identity, estimator
correctness, replay idempotency, restart."""

import os

import pandas as pd
from pyspark.sql import functions as F


def _text(i: int, n: int = 40) -> str:
    # heavy token "hot" appears i times per doc, fillers once each
    return " ".join(["hot"] * i + [f"tok{i}x{j}" for j in range(n)])


def _cells(df) -> dict:
    return {(r["row_i"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_partial_sketch_matches_batch_query_shape(spark):
    """batch_partial_sketch over a static frame equals the cell counts
    the batch cms query computes from the same tokens."""
    from rxtls_spark.queries_training import CMS_D, CMS_W
    from rxtls_spark.streaming.cms_stream import batch_partial_sketch

    docs = spark.createDataFrame(
        [(1, _text(3)), (2, _text(5)), (3, "")],
        "doc_id long, text string",
    )
    cells = _cells(batch_partial_sketch(docs))
    assert all(0 <= r < CMS_D and 0 <= b < CMS_W for r, b in cells)
    # every token instance lands in exactly D cells
    n_tokens = 3 + 40 + 5 + 40
    assert sum(cells.values()) == n_tokens * CMS_D


def test_cms_stream_equals_batch_over_union(spark, tmp_path):
    """Three micro-batches + a restart batch: the merged streaming
    sketch is CELL-IDENTICAL to the batch sketch over the union corpus
    (CMS merge is linear), and the estimator dominates exact counts."""
    from rxtls_spark.streaming.cms_stream import (
        batch_partial_sketch,
        estimate_counts,
        merged_sketch,
        start_cms_stream,
    )

    src = tmp_path / "docs_src"
    src.mkdir()
    out = str(tmp_path / "out")
    all_rows = []

    def write_file(name, rows):
        all_rows.extend(rows)
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            src / f"{name}.parquet"
        )

    def run():
        q = start_cms_stream(spark, str(src), out)
        q.awaitTermination(180)

    write_file("b1", [(1, _text(2)), (2, _text(7))])
    write_file("b2", [(3, _text(4))])
    write_file("b3", [(4, _text(9)), (5, _text(1))])
    run()

    union = spark.createDataFrame(all_rows, "doc_id long, text string")
    assert _cells(merged_sketch(spark, out)) == _cells(
        batch_partial_sketch(union)
    )

    # restart with a new file: only the new batch is processed
    write_file("b4", [(6, _text(6))])
    run()
    union = spark.createDataFrame(all_rows, "doc_id long, text string")
    assert _cells(merged_sketch(spark, out)) == _cells(
        batch_partial_sketch(union)
    )

    # estimator: min over D cells >= exact count, and for the dominant
    # token the estimate is exact or an overcount, never an undercount
    exact_hot = sum(r[1].split().count("hot") for r in all_rows)
    est = {
        r["tok"]: r["cms_est"]
        for r in estimate_counts(
            spark, out, ["hot", "tok1x0", "never-seen"]
        ).collect()
    }
    assert est["hot"] >= exact_hot
    assert est["tok1x0"] >= 1
    assert est["never-seen"] >= 0


def test_cms_stream_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch_id overwrites its own partition —
    merged counts unchanged (no double counting on replay)."""
    from rxtls_spark.streaming.cms_stream import merged_sketch, write_batch

    out = str(tmp_path / "out")
    b0 = spark.createDataFrame([(1, _text(3))], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, _text(5))], "doc_id long, text string")
    write_batch(b0, 0, out)
    write_batch(b1, 1, out)
    before = _cells(merged_sketch(spark, out))
    write_batch(b1, 1, out)  # replay
    assert _cells(merged_sketch(spark, out)) == before
