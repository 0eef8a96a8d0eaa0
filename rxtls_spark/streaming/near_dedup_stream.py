"""Streaming NEAR-dedup — incremental MinHash+LSH over micro-batches.

`dedup_stream` (exact, keyed state) can hold its state in the state
store because an exact-dedup record is one hash.  Near-dedup state is
the full signature/text corpus — far too wide for keyed state — so the
always-on shape is different: a ``foreachBatch`` loop where each
micro-batch is LSH-joined against a PERSISTED index of everything
admitted so far, then against itself, and the survivors append to the
index.  This is the standard incremental-corpus build: batch-quality
near-dedup semantics (same signatures, same banding, same exact-Jaccard
verify as operators/dedup.py) with streaming arrival.

Exactly-once: each batch writes its admissions to the partition
``admit_batch=<batch_id>`` with mode=overwrite — a retried batch
recomputes the same deterministic result and overwrites its own
partition, so replays are idempotent and the checkpoint's offset log
guarantees no batch is skipped.  Crucially the index a batch dedups
against is filtered to PRIOR batches (``admit_batch < batch_id``): a
retry that crashed between the parquet write and the checkpoint commit
would otherwise re-read its own partition, self-match every admission
at Jaccard 1.0, and overwrite the partition with an empty set — silent
loss of that batch's admissions.

Scale notes: the per-batch work is (batch × index) band-bucket
equi-joins — never a cross join; the index side is bucket-capped
(audited, like the batch path); at 100 TB the index would live in a
bucketed table (or Iceberg with a bucket transform) so the band join
co-locates without reshuffling the whole index each batch.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark.operators.dedup import (
    DEFAULT_BUCKET_CAP,
    jaccard_udf,
    lsh_candidate_pairs_between,
    minhash_near_dups,
    minhash_signatures,
)


def near_dedup_admit(
    batch_docs: DataFrame,
    index_docs: DataFrame | None,
    threshold: float = 0.7,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """The batch-level admission rule (pure DataFrame function so it is
    testable without a stream):

    1. drop batch docs near-dup (Jaccard ≥ threshold) to ANY admitted
       index doc — LSH candidates between the corpora, exact verify;
    2. near-dedup the survivors against each other with the full batch
       pipeline (LSH → verify → connected components → keep-list), so
       chains within a batch resolve exactly like the batch job.

    Returns the admitted (doc_id, text) rows."""
    from rxtls_spark.operators.cluster import dedup_keep_list

    survivors = batch_docs.select("doc_id", "text")
    if index_docs is not None:
        cands = lsh_candidate_pairs_between(
            minhash_signatures(survivors),
            minhash_signatures(index_docs),
            bucket_cap,
        )
        paired = cands.join(
            survivors.withColumnsRenamed({"doc_id": "doc_a", "text": "text_a"}),
            "doc_a",
        ).join(
            index_docs.select("doc_id", "text").withColumnsRenamed(
                {"doc_id": "doc_b", "text": "text_b"}
            ),
            "doc_b",
        )
        dups = (
            paired.withColumn("j", jaccard_udf("text_a", "text_b"))
            .where(F.col("j") >= threshold)
            .select(F.col("doc_a").alias("doc_id"))
            .distinct()
        )
        survivors = survivors.join(dups, "doc_id", "left_anti")
    pairs = minhash_near_dups(survivors, threshold, bucket_cap).select(
        "doc_a", "doc_b"
    )
    drops = dedup_keep_list(pairs).where(~F.col("keep")).select("doc_id")
    return survivors.join(drops, "doc_id", "left_anti")


def admitted_index(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The persisted admitted corpus, or None before the first batch.

    Only a genuinely-absent index maps to None (dir missing, or present
    but empty so schema inference fails with AnalysisException).  Real
    read failures — corrupt files, permissions — propagate: treating
    them as "no index yet" would silently admit the batch with no dedup
    against history."""
    index_dir = os.path.join(out_dir, "admitted")
    if not os.path.isdir(index_dir):
        return None
    try:
        return spark.read.parquet(index_dir)
    except AnalysisException:
        return None


def admit_and_write(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    threshold: float = 0.7,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> None:
    """One micro-batch of the foreachBatch loop (module-level so replay
    idempotency is testable without a stream): dedup against the index
    restricted to batches STRICTLY BEFORE this one, then overwrite this
    batch's own partition.  A retried batch therefore never sees its own
    earlier (uncommitted) write and reproduces the identical result."""
    if batch_df.isEmpty():
        return
    index_dir = os.path.join(out_dir, "admitted")
    index = admitted_index(batch_df.sparkSession, out_dir)
    if index is not None:
        index = index.where(
            F.col("admit_batch").cast("long") < F.lit(batch_id)
        ).select("doc_id", "text")
    admitted = near_dedup_admit(batch_df, index, threshold, bucket_cap)
    admitted.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"admit_batch={batch_id}")
    )


def start_near_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    threshold: float = 0.7,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """documents stream (doc_id, text parquet files) → incrementally
    near-deduped corpus under ``out_dir>/admitted/admit_batch=N/``."""
    index_dir = os.path.join(out_dir, "admitted")
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        admit_and_write(batch_df, batch_id, out_dir, threshold, bucket_cap)

    writer = stream.writeStream.foreachBatch(admit_batch).option(
        "checkpointLocation", os.path.join(out_dir, "checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
