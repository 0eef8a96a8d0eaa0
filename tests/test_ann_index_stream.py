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


def test_search_scan_prunes_to_probed_cells(spark, tmp_path, emb_rows):
    """The search's index scan must carry a STATIC partition filter on
    the probed cells (r4 verdict item 3): assert the executed plan's
    PartitionFilters mentions the cell column (not relying on dynamic
    pruning firing) and, footer-exact, that the rows the pruned scan
    returns equal the parquet footer row counts of the probed cells'
    files alone — a strict subset of the index."""
    import re

    import pyarrow.parquet as pq

    from rxtls_spark.operators.similarity import (
        ivf_probe_expr,
        load_quantizer,
        query_set,
    )
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.streaming.ann_index_stream import (
        add_batch_to_index,
        ann_index_search,
    )

    out = str(tmp_path / "out")

    def df_of(rows):
        return spark.createDataFrame(
            [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in rows],
            "vec_id long, embedding array<double>",
        )

    add_batch_to_index(df_of(emb_rows), 0, out)
    qs = query_set(df_of(emb_rows)).limit(1)
    search = ann_index_search(spark, out, qs, topk=5, n_probe=2)

    plan = plan_string(search)
    assert re.search(r"PartitionFilters: \[.*cell#\d+", plan), plan

    # the probed set for one query at n_probe=2 is 2 of the 16 cells
    cents, _ = load_quantizer(spark, os.path.join(out, "quantizer"))
    probed = sorted(
        r["c"]
        for r in qs.select(
            F.explode(ivf_probe_expr(cents, F.col("q_emb"), 2)).alias("c")
        ).collect()
    )
    assert len(set(probed)) == 2

    # footer-exact: rows in probed cells' files == pruned scan rows
    batch_dir = os.path.join(out, "index", "add_batch=0")
    footer_rows = {}
    for d in os.listdir(batch_dir):
        if not d.startswith("cell="):
            continue
        cell = int(d.split("=")[1])
        footer_rows[cell] = sum(
            pq.ParquetFile(os.path.join(batch_dir, d, f)).metadata.num_rows
            for f in os.listdir(os.path.join(batch_dir, d))
            if f.endswith(".parquet")
        )
    assert set(probed) < set(footer_rows)  # strict subset: real pruning
    pruned = (
        spark.read.parquet(os.path.join(out, "index"))
        .where(F.col("cell").isin(probed))
        .count()
    )
    assert pruned == sum(footer_rows[c] for c in probed)
    assert pruned < sum(footer_rows.values())
    assert search.count() > 0


def test_compaction_preserves_search_and_reduces_files(
    spark, tmp_path, emb_rows
):
    """compact_index (r4 verdict item 5): after merging the per-batch
    small files, search results are IDENTICAL, the leaf-file count
    drops, no vector is lost or duplicated, and cell pruning still
    works on the compacted layout."""
    from rxtls_spark.operators.similarity import query_set
    from rxtls_spark.streaming.ann_index_stream import (
        _index_leaf_files,
        add_batch_to_index,
        ann_index_search,
        compact_index,
    )

    out = str(tmp_path / "out")

    def df_of(rows):
        return spark.createDataFrame(
            [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in rows],
            "vec_id long, embedding array<double>",
        )

    # 5 small batches → ≥5 files per populated cell
    n = len(emb_rows)
    step = n // 5
    for b in range(5):
        add_batch_to_index(df_of(emb_rows[b * step : (b + 1) * step]), b, out)

    index_dir = os.path.join(out, "index")
    before_files = _index_leaf_files(index_dir)
    qs = query_set(df_of(emb_rows))
    before = sorted(
        map(tuple, ann_index_search(spark, out, qs, topk=5).collect())
    )

    summary = compact_index(spark, out, target_bytes=64 * 1024 * 1024)
    after_files = _index_leaf_files(index_dir)
    assert summary["n_rewritten"] > 0
    assert summary["n_files_after"] < summary["n_files_before"]
    assert len(after_files) == summary["n_files_after"]
    assert len(before_files) == summary["n_files_before"]

    idx = spark.read.parquet(index_dir)
    assert idx.count() == 5 * step
    assert idx.select("vec_id").distinct().count() == 5 * step

    after = sorted(
        map(tuple, ann_index_search(spark, out, qs, topk=5).collect())
    )
    assert after == before and len(after) > 0

    # idempotent re-run: everything already compact → no-op
    again = compact_index(spark, out, target_bytes=64 * 1024 * 1024)
    assert again["n_rewritten"] == 0
    assert again["n_files_after"] == summary["n_files_after"]


def test_compaction_crash_between_rename_and_deletes_recovers(
    spark, tmp_path, emb_rows
):
    """Crash injection: if the compacted partition was renamed into the
    live tree but the consumed files weren't deleted yet, the journal
    replay at the start of the next compaction removes them — the index
    never double-counts."""
    import json

    from rxtls_spark.operators.similarity import query_set
    from rxtls_spark.streaming.ann_index_stream import (
        add_batch_to_index,
        ann_index_search,
        compact_index,
    )

    out = str(tmp_path / "out")

    def df_of(rows):
        return spark.createDataFrame(
            [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in rows],
            "vec_id long, embedding array<double>",
        )

    half = len(emb_rows) // 2
    add_batch_to_index(df_of(emb_rows[:half]), 0, out)
    add_batch_to_index(df_of(emb_rows[half:]), 1, out)
    qs = query_set(df_of(emb_rows))
    before = sorted(
        map(tuple, ann_index_search(spark, out, qs, topk=5).collect())
    )

    compact_index(spark, out, target_bytes=64 * 1024 * 1024)

    # simulate the crash window: resurrect a consumed-looking file by
    # re-adding batch 1 AND writing a journal claiming its files are
    # consumed — recovery must delete them before the next plan
    add_batch_to_index(df_of(emb_rows[half:]), 1, out)
    dup_paths = []
    b1 = os.path.join(out, "index", "add_batch=1")
    for cell_dir in os.listdir(b1):
        cpath = os.path.join(b1, cell_dir)
        if not os.path.isdir(cpath):
            continue
        for f in os.listdir(cpath):
            if f.endswith(".parquet"):
                dup_paths.append(os.path.join(cpath, f))
    with open(os.path.join(out, "compact_journal.json"), "w") as fh:
        json.dump(dup_paths, fh)

    summary = compact_index(spark, out, target_bytes=64 * 1024 * 1024)
    idx = spark.read.parquet(os.path.join(out, "index"))
    assert idx.count() == len(emb_rows)
    assert idx.select("vec_id").distinct().count() == len(emb_rows)
    after = sorted(
        map(tuple, ann_index_search(spark, out, qs, topk=5).collect())
    )
    assert after == before
    assert summary["n_files_after"] >= 1


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
