"""Streaming IVF index maintenance: train-once quantizer, idempotent
per-batch adds, search == the batch ANN over the union."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_rows(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )


def _write_batch(src, name, rows):
    pd.DataFrame(
        {
            "vec_id": [r["vec_id"] for r in rows],
            "embedding": [[float(v) for v in r["embedding"]] for r in rows],
        }
    ).to_parquet(src / f"{name}.parquet")


def test_streaming_index_matches_batch_ann(spark, tmp_path, emb_rows):
    """Build the index from 3 streamed batches (with a restart in the
    middle); searching it returns EXACTLY what batch ann_ivf_topk
    returns over the union corpus with the same frozen quantizer."""
    from rxtls_spark.operators.similarity import (
        ann_ivf_topk,
        load_quantizer,
        query_set,
    )
    from rxtls_spark.streaming.ann_index_stream import (
        ann_index_search,
        start_ann_index,
    )

    src = tmp_path / "emb_src"
    src.mkdir()
    out = str(tmp_path / "out")

    third = len(emb_rows) // 3
    _write_batch(src, "b1", emb_rows[:third])
    q = start_ann_index(spark, str(src), out,
                    schema="vec_id long, embedding array<double>")
    q.awaitTermination(180)

    # quantizer trained on batch 1 and persisted
    cents, _ = load_quantizer(spark, os.path.join(out, "quantizer"))
    assert cents is not None and len(cents) == 16

    _write_batch(src, "b2", emb_rows[third : 2 * third])
    _write_batch(src, "b3", emb_rows[2 * third :])
    q = start_ann_index(spark, str(src), out,  # restart, same checkpoint
                    schema="vec_id long, embedding array<double>")
    q.awaitTermination(180)

    # quantizer unchanged by later batches (train-once contract)
    again, _ = load_quantizer(spark, os.path.join(out, "quantizer"))
    assert again == cents

    union = spark.createDataFrame(
        [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in emb_rows],
        "vec_id long, embedding array<double>",
    )
    qs = query_set(union)
    got = sorted(map(tuple, ann_index_search(spark, out, qs, topk=5).collect()))
    exp = sorted(
        map(
            tuple,
            ann_ivf_topk(union, qs, k=5, centroids=cents).collect(),
        )
    )
    assert got == exp and len(got) > 0


def test_add_batch_replay_is_idempotent(spark, tmp_path, emb_rows):
    """Replaying a batch id (crash between write and checkpoint commit)
    overwrites its own partition with the identical content — the index
    never double-counts a vector."""
    from rxtls_spark.streaming.ann_index_stream import (
        add_batch_to_index,
        ann_index_search,
    )
    from rxtls_spark.operators.similarity import query_set

    out = str(tmp_path / "out")
    half = len(emb_rows) // 2

    def df_of(rows):
        return spark.createDataFrame(
            [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in rows],
            "vec_id long, embedding array<double>",
        )

    add_batch_to_index(df_of(emb_rows[:half]), 0, out)
    add_batch_to_index(df_of(emb_rows[half:]), 1, out)
    index = spark.read.parquet(os.path.join(out, "index"))
    n = index.count()
    assert n == len(emb_rows)

    qs = query_set(df_of(emb_rows))
    before = sorted(map(tuple, ann_index_search(spark, out, qs).collect()))

    # replay batch 1
    add_batch_to_index(df_of(emb_rows[half:]), 1, out)
    index = spark.read.parquet(os.path.join(out, "index"))
    assert index.count() == n
    assert index.select("vec_id").distinct().count() == n
    after = sorted(map(tuple, ann_index_search(spark, out, qs).collect()))
    assert after == before
