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
    everything ever added."""
    from pyspark.sql import Window

    from rxtls_spark.operators.similarity import cosine_expr, ivf_probe_expr

    cents, _ = load_quantizer(spark, _quantizer_dir(out_dir))
    if cents is None:
        raise ValueError(f"no quantizer at {out_dir} — index is empty")
    index = spark.read.parquet(os.path.join(out_dir, "index")).select(
        "vec_id", "embedding", "cell"
    )
    q_cells = queries.select(
        "q_id",
        "q_emb",
        F.explode(ivf_probe_expr(cents, F.col("q_emb"), n_probe)).alias(
            "cell"
        ),
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
