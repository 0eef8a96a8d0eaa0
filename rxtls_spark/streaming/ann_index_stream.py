"""Streaming IVF index maintenance — incremental ANN over arriving
embeddings.

The batch ANN path (operators/similarity.py) assumes a static corpus;
a crawl keeps producing new embeddings.  This is the always-on shape:

1. The quantizer (IVF centroids) trains ONCE — on the first batch if
   no persisted quantizer exists — and is persisted via
   `save_quantizer`; every later batch and every search reload it, so
   cell assignment is stable for the index's whole lifetime (the FAISS
   add-after-train contract: you never retrain a live index's coarse
   quantizer, you rebuild offline and swap).
2. Each micro-batch assigns its vectors to cells with the persisted
   quantizer (per-row JVM argmax — no join, no shuffle) and writes
   ``index/add_batch=<id>/`` with mode=overwrite, so a replayed batch
   reproduces its own partition byte-for-byte: exactly-once without a
   transactional store (same idempotent-partition pattern as
   streaming/near_dedup_stream.py).
3. Search reloads the quantizer, probes ``n_probe`` cells, and
   equi-joins the probed cells against the whole accumulated index —
   identical semantics to `ann_ivf_topk` over the union of all batches
   (pytest-locked), because assignment used the same frozen centroids.

Scale notes: the per-batch write partitions by cell inside the batch
dir, so a search prunes to n_probe cells × all batches; at 10^12
vectors the index lives in a cell-bucketed table (or Iceberg with a
bucket transform) and periodic compaction merges the per-batch files
(operators/compact.py is the planner).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark.operators.similarity import (
    ivf_assign_expr,
    load_quantizer,
    save_quantizer,
    train_ivf_centroids,
)


def _quantizer_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "quantizer")


def ensure_quantizer(
    spark: SparkSession,
    out_dir: str,
    batch: DataFrame,
    k: int = 16,
    iters: int = 3,
) -> list[tuple]:
    """Load the persisted quantizer, or train it on this (first) batch
    and persist — train-once semantics for the index's lifetime."""
    cents, _ = load_quantizer(spark, _quantizer_dir(out_dir))
    if cents is None:
        cents = train_ivf_centroids(batch, k=k, iters=iters)
        save_quantizer(spark, _quantizer_dir(out_dir), centroids=cents)
    return cents


def add_batch_to_index(
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    k: int = 16,
    iters: int = 3,
) -> None:
    """One micro-batch: assign cells with the frozen quantizer, write
    the idempotent ``add_batch=<id>`` partition (cell-partitioned
    inside it)."""
    if batch.isEmpty():
        return
    cents = ensure_quantizer(batch.sparkSession, out_dir, batch, k, iters)
    assigned = batch.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding")).alias("cell"),
    )
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(out_dir, "index", f"add_batch={batch_id}"))
    )


def start_ann_index(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    k: int = 16,
    iters: int = 3,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
    schema: str = "vec_id long, embedding array<float>",
):
    """embeddings stream ((vec_id, embedding) parquet files) →
    incrementally maintained IVF index under ``out_dir``.  ``schema``
    must match the arriving files' element type exactly (Spark 4
    parquet reads are type-strict: a DOUBLE file under a float schema
    fails, and vice versa)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        add_batch_to_index(batch_df, batch_id, out_dir, k, iters)

    writer = stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", os.path.join(out_dir, "checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _index_leaf_files(index_dir: str) -> list[dict]:
    """Driver-side inventory of the index's parquet leaf files:
    (add_batch, cell, path, bytes).  Metadata-scale — one row per FILE,
    not per vector; at 10^12 vectors this listing comes from the table
    manifest instead of a directory walk, same shape."""
    rows = []
    for batch_dir in sorted(os.listdir(index_dir)):
        if not batch_dir.startswith("add_batch="):
            continue
        add_batch = int(batch_dir.split("=")[1])
        bpath = os.path.join(index_dir, batch_dir)
        for cell_dir in sorted(os.listdir(bpath)):
            if not cell_dir.startswith("cell="):
                continue
            cell = int(cell_dir.split("=")[1])
            cpath = os.path.join(bpath, cell_dir)
            for f in sorted(os.listdir(cpath)):
                if f.endswith(".parquet"):
                    p = os.path.join(cpath, f)
                    rows.append(
                        {
                            "add_batch": add_batch,
                            "cell": cell,
                            "path": p,
                            "bytes": os.path.getsize(p),
                        }
                    )
    return rows


def _footer_rows(paths: list[str]) -> int:
    """Exact row count of a set of parquet files from their footers —
    driver-side metadata reads, no Spark job."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def _apply_delete_journal(index_dir: str) -> None:
    """Finish an interrupted compaction: the journal lists the consumed
    source files whose rows were already moved into a compacted
    partition — delete them (idempotent) before trusting the index."""
    journal = os.path.join(os.path.dirname(index_dir), "compact_journal.json")
    if not os.path.exists(journal):
        return
    for p in json.load(open(journal)):
        if os.path.exists(p):
            os.remove(p)
        crc = os.path.join(
            os.path.dirname(p), f".{os.path.basename(p)}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
    _prune_empty_dirs(index_dir)
    os.remove(journal)


def _prune_empty_dirs(index_dir: str) -> None:
    """Remove fully-consumed cell/batch dirs; `_SUCCESS` markers and
    `.crc` siblings don't count as content."""

    def only_junk(path: str) -> bool:
        return all(
            e == "_SUCCESS" or e.startswith(".") for e in os.listdir(path)
        )

    for batch_dir in list(os.listdir(index_dir)):
        bpath = os.path.join(index_dir, batch_dir)
        if not os.path.isdir(bpath):
            continue
        for cell_dir in list(os.listdir(bpath)):
            cpath = os.path.join(bpath, cell_dir)
            if os.path.isdir(cpath) and only_junk(cpath):
                import shutil

                shutil.rmtree(cpath)
        if only_junk(bpath):
            import shutil

            shutil.rmtree(bpath)


def compact_index(
    spark: SparkSession,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Merge the per-batch small files of the streaming index into
    ~``target_bytes`` files per cell — the maintenance pass the module
    docstring names, planned by ``operators/compact.compaction_plan``
    (byte-range groups per cell over batch order) and executed as ONE
    Spark job over only the files being rewritten.

    OFFLINE contract: run with the stream stopped, and only over
    batches the checkpoint has committed — Structured Streaming never
    replays a committed batch id against the same checkpoint, so the
    consumed ``add_batch=N`` partitions can be safely absorbed.  The
    rewritten rows land in a single new ``add_batch=<negative id>``
    partition (cell-subpartitioned, same two-level layout, so partition
    discovery and the search's cell pruning are untouched) via
    write-to-tmp + one atomic directory rename into the live tree; the
    consumed-file delete list is journaled BEFORE the rename and
    replayed on the next compaction if a crash strikes between rename
    and deletes — the index is never left half-moved.

    Single-file groups are left in place (already compact).  Returns a
    summary dict; ``n_files_before/after`` count parquet leaves."""
    import shutil

    from rxtls_spark.operators.compact import compaction_plan

    index_dir = os.path.join(out_dir, "index")
    _apply_delete_journal(index_dir)
    files = _index_leaf_files(index_dir)
    if not files:
        return {"n_files_before": 0, "n_files_after": 0, "n_rewritten": 0}

    # order inside a cell: batch id, then file name (negative ids —
    # prior compactions — sort first via the +10^9 offset)
    inv = spark.createDataFrame(
        [
            (
                f["cell"],
                f"{f['add_batch'] + 1_000_000_000:012d}|{os.path.basename(f['path'])}",
                f["path"],
                0,
                f["bytes"],
            )
            for f in files
        ],
        "cell long, ord string, path string, n_rows long, bytes long",
    )
    plan = compaction_plan(inv, target_bytes, key_col="cell", order_col="ord")
    rows = plan.select("cell", "ord", "grp", "grp_files").collect()
    ord_to_path = {
        (f["cell"], f"{f['add_batch'] + 1_000_000_000:012d}|{os.path.basename(f['path'])}"): f["path"]
        for f in files
    }
    rewrite = [
        (r["cell"], int(r["grp"]), ord_to_path[(r["cell"], r["ord"])])
        for r in rows
        if r["grp_files"] > 1
    ]
    if not rewrite:
        return {
            "n_files_before": len(files),
            "n_files_after": len(files),
            "n_rewritten": 0,
        }

    new_batch = min(min(f["add_batch"] for f in files), 0) - 1
    paths = [p for _, _, p in rewrite]
    # Hadoop-style URI, `file:` + absolute path — what
    # _metadata.file_path actually carries on a local filesystem
    grp_map = spark.createDataFrame(
        [(f"file:{p}", g) for _, g, p in rewrite], "fp string, grp long"
    )
    n_groups = len({(c, g) for c, g, _ in rewrite})

    tmp = os.path.join(out_dir, "compact_tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    (
        spark.read.parquet(index_dir)
        .withColumn("fp", F.col("_metadata.file_path"))
        .join(F.broadcast(grp_map), "fp")
        # one shuffle partition per (cell, grp) keeps ~one output file
        # per group (a hash collision merges two groups' files — a
        # size overshoot, never a correctness issue); 2× slots makes
        # collisions rare
        .repartition(max(2 * n_groups, 1), F.col("cell"), F.col("grp"))
        .select("vec_id", "embedding", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp)
    )
    for junk in ("_SUCCESS",):
        j = os.path.join(tmp, junk)
        if os.path.exists(j):
            os.remove(j)

    # SAFETY GATE before any delete is journaled: the rewritten rows
    # must equal the source footers' row count exactly — a path-format
    # mismatch (or any silently-empty join) must abort with the index
    # untouched, never absorb-and-delete
    expect = _footer_rows(paths)
    got = spark.read.parquet(tmp).count()
    if got != expect:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction rewrite produced {got} rows, sources hold "
            f"{expect} — aborting with the index untouched"
        )

    journal = os.path.join(out_dir, "compact_journal.json")
    with open(journal + ".tmp", "w") as fh:
        json.dump(paths, fh)
    os.rename(journal + ".tmp", journal)
    os.rename(tmp, os.path.join(index_dir, f"add_batch={new_batch}"))
    _apply_delete_journal(index_dir)

    after = _index_leaf_files(index_dir)
    return {
        "n_files_before": len(files),
        "n_files_after": len(after),
        "n_rewritten": len(paths),
        "n_groups": n_groups,
        "compacted_batch": new_batch,
    }


def ann_index_search(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    topk: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Top-k cosine search over the accumulated index: probe each
    query's ``n_probe`` nearest cells (frozen quantizer), equi-join the
    probed cells, exact cosine inside — `ann_ivf_topk` semantics over
    everything ever added.

    The index scan carries an explicit STATIC partition filter on the
    union of probed cells (queries are metadata-scale — the same frame
    we broadcast — so collecting their probe lists is free): relying on
    dynamic partition pruning to fire for the broadcast join would scan
    every cell's files whenever the runtime heuristic declines, and at
    10^12 vectors the whole point of IVF is touching n_probe/k of the
    corpus.  tests/test_ann_index_stream.py asserts the scan's
    PartitionFilters and footer row counts."""
    from pyspark.sql import Window

    from rxtls_spark.operators.similarity import cosine_expr, ivf_probe_expr

    cents, _ = load_quantizer(spark, _quantizer_dir(out_dir))
    if cents is None:
        raise ValueError(f"no quantizer at {out_dir} — index is empty")
    q_cells = queries.select(
        "q_id",
        "q_emb",
        F.explode(ivf_probe_expr(cents, F.col("q_emb"), n_probe)).alias(
            "cell"
        ),
    )
    probed = sorted(
        r["cell"] for r in q_cells.select("cell").distinct().collect()
    )
    index = (
        spark.read.parquet(os.path.join(out_dir, "index"))
        .where(F.col("cell").isin(probed))
        .select("vec_id", "embedding", "cell")
    )
    cands = index.join(F.broadcast(q_cells), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    scored = cands.select(
        "q_id", F.col("vec_id").alias("neighbor_id"), sim_e5.alias("sim_e5")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_e5").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("q_id", "neighbor_id", F.col("rank").cast("long"), "sim_e5")
    )
