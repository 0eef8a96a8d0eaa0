"""Embedding-cosine near-duplicate detection (driver mandate).

Two variants, the same exact/scale split as the ANN module:

- **exact** (`embedding_dup_pairs`): all pairs with cosine ≥ τ via a
  broadcast self-join — the verification variant, oracle-checked
  against DuckDB's full pairwise recomputation.  At 10^12 rows this
  shape is only valid when one side is broadcastable; it exists to
  verify the LSH variant's hits.
- **scale** (`embedding_dup_pairs_lsh`): candidates restricted to
  shared multi-table LSH buckets (equi-join on bucket — no cross
  join), then exact cosine verify.  Recall vs the exact variant is
  measured in tests.

Deterministic duplicate injection mirrors the text-dedup pattern:
vec_id % 25 == 0 gets an exact copy at vec_id + 10^6 (cosine exactly
1.0), SQL-mirrorable since the list is copied unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rxtls_spark.operators.similarity import (
    cosine_expr,
    lsh_buckets_udf,
    spread_scan,
)

DUP_OFFSET = 1_000_000


def with_injected_embedding_dups(embeddings: DataFrame) -> DataFrame:
    base = embeddings.select("vec_id", "embedding", "label")
    copies = base.where(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + F.lit(DUP_OFFSET)).alias("vec_id"),
        "embedding",
        "label",
    )
    return base.unionByName(copies)


def _pair_sim(joined: DataFrame, threshold_e5: int) -> DataFrame:
    sim_e5 = F.floor(cosine_expr("emb_a", "emb_b") * 100000).cast("long")
    return (
        joined.withColumn("sim_e5", sim_e5)
        .where(F.col("sim_e5") >= threshold_e5)
        .select("vec_a", "vec_b", "sim_e5")
    )


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact pairwise (a < b) cosine ≥ threshold — verification variant.

    spread_scan: the stream side of the broadcast pair join would run
    the whole O(n²) cosine verify nearly single-task off a 1-2-split
    gate-scale scan (measured 9 s → ~1 s at sf0.01)."""
    a = spread_scan(
        embeddings.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
        )
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    joined = a.join(F.broadcast(b), on=F.col("vec_a") < F.col("vec_b"))
    return _pair_sim(joined, int(threshold * 100000))


def embedding_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """LSH-bucketed near-dup pairs: equi-join on (table, bucket), exact
    cosine verify — the shape that survives 10^12 rows."""
    banded = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(lsh_buckets_udf(F.col("embedding"))).alias("bucket"),
    ).localCheckpoint(eager=False)  # one bucket-UDF run for both join sides
    a = banded.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    b = banded.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        "bucket",
    )
    cands = (
        a.join(b, on=["bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return _pair_sim(cands, int(threshold * 100000))
