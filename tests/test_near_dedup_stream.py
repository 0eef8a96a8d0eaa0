"""Incremental (streaming) near-dedup: batch-level admission rule +
the foreachBatch loop with a persisted admitted index."""

import os

import pytest
from pyspark.sql import functions as F


def _text(i: int, n: int = 30) -> str:
    return " ".join(f"tok{i}x{j}" for j in range(n))


def test_near_dedup_admit_rule(spark):
    """Batch docs near-dup to the index are dropped; intra-batch chains
    resolve to the lowest doc_id; distinct docs are admitted."""
    from rxtls_spark.streaming.near_dedup_stream import near_dedup_admit

    index = spark.createDataFrame(
        [(1, _text(1)), (2, _text(2))], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, _text(1) + " extra"),        # near-dup of index doc 1
            (11, _text(7)),                    # new
            (12, _text(7) + " pad"),           # intra-batch dup of 11
            (13, _text(7) + " pad more"),      # chain: dup of 12
            (14, _text(9)),                    # new
        ],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in near_dedup_admit(batch, index).collect())
    assert got == [11, 14]

    # no index (first batch): only intra-batch dedup applies
    got0 = sorted(
        r["doc_id"] for r in near_dedup_admit(batch, None).collect()
    )
    assert got0 == [10, 11, 14]


def test_streaming_near_dedup_incremental_index(spark, tmp_path):
    """Cross-batch + cross-restart: the admitted index keeps rejecting
    near-dups of everything admitted in ANY earlier batch."""
    import pandas as pd

    from rxtls_spark.streaming.near_dedup_stream import start_near_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    out = str(tmp_path / "out")

    def write_batch(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            src / f"{name}.parquet"
        )

    def run():
        q = start_near_dedup(spark, str(src), out)
        q.awaitTermination(180)

    def admitted():
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(out, "admitted")).collect()
        )

    # batch 1: doc 1, its near-copy 2, distinct 3
    write_batch("b1", [(1, _text(1)), (2, _text(1) + " extra"), (3, _text(3))])
    run()
    assert admitted() == [1, 3]

    # batch 2: near-copy of admitted doc 1 → rejected; new doc 7 → admitted
    write_batch("b2", [(5, _text(1) + " tail"), (7, _text(7))])
    run()
    assert admitted() == [1, 3, 7]

    # restart (same checkpoint): near-copy of doc 3 rejected, new admitted
    write_batch("b3", [(9, _text(3) + " pad"), (11, _text(11))])
    run()
    assert admitted() == [1, 3, 7, 11]


def test_near_dedup_replay_is_idempotent(spark, tmp_path):
    """A retried batch (crash between parquet write and checkpoint
    commit) must NOT dedup against its own earlier write: replaying the
    same batch_id yields the identical partition, not an empty one."""
    from rxtls_spark.streaming.near_dedup_stream import admit_and_write

    out = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, _text(1)), (3, _text(3))], "doc_id long, text string"
    )
    admit_and_write(b0, 0, out)
    b1 = spark.createDataFrame(
        [(5, _text(1) + " tail"), (7, _text(7))], "doc_id long, text string"
    )
    admit_and_write(b1, 1, out)

    def part(n):
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(
                os.path.join(out, "admitted", f"admit_batch={n}")
            ).collect()
        )

    assert part(0) == [1, 3] and part(1) == [7]
    # replay batch 1: its own admit_batch=1 partition is on disk (the
    # pre-fix code self-matched doc 7 at Jaccard 1.0 and emptied it)
    admit_and_write(b1, 1, out)
    assert part(1) == [7]
    # and replaying batch 0 likewise leaves [1, 3] intact
    admit_and_write(b0, 0, out)
    assert part(0) == [1, 3]


def test_admitted_index_propagates_real_read_errors(spark, tmp_path):
    """Corrupt index files must raise, not silently become 'no index'."""
    from rxtls_spark.streaming.near_dedup_stream import admitted_index

    out = tmp_path / "out"
    assert admitted_index(spark, str(out)) is None  # dir absent → None
    idx = out / "admitted"
    idx.mkdir(parents=True)
    assert admitted_index(spark, str(out)) is None  # empty dir → None
    (idx / "part-00000.parquet").write_bytes(b"not a parquet file")
    raised = False
    try:
        df = admitted_index(spark, str(out))
        assert df is not None, "corrupt index silently treated as absent"
        df.collect()
    except AssertionError:
        raise
    except Exception:
        raised = True
    assert raised, "corrupt index read did not raise"
