"""Similarity search over the `embeddings` table (driver mandate).

- **Brute-force cosine top-k** (baseline): broadcast the (small) query
  set against all embeddings; cosine computed JVM-side with
  zip_with/aggregate in double precision; top-k via window row_number.
  Oracle-able: DuckDB computes the same with list_cosine_similarity on
  DOUBLE[].  Ranking uses floor(sim*1e5) + vec_id tiebreak so FP noise
  can't flip the order between engines.
- **LSH-bucketed ANN** (scale path): deterministic random-hyperplane
  signatures (seed 42) put each vector in a 2^nbits bucket; candidates
  are per-bucket only (plus the query's bucket), so the join is a
  bucket-key equi-join, never a cross join.  Recall measured vs brute
  force in tests.

At 10^12 rows the brute-force variant is only valid for a broadcastable
query set (it's a map-side nested loop per row — no shuffle); the IVF
route is the real ANN: signatures are one numpy matmul per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

EMB_DIM = 64  # driver embeddings are fixed-width; read at runtime if not

_HYPERPLANES_SEED = 42
_N_BITS = 6  # bits per table
_N_TABLES = 8  # multi-table LSH: union of candidates across tables


def _hyperplanes(dim: int) -> np.ndarray:
    """(tables, bits, dim) deterministic hyperplanes."""
    rng = np.random.RandomState(_HYPERPLANES_SEED)
    return rng.standard_normal((_N_TABLES, _N_BITS, dim))


def cosine_expr(a: str, b: str):
    """JVM-side cosine similarity of two array<float|double> columns."""
    ad = F.transform(F.col(a), lambda x: x.cast("double"))
    bd = F.transform(F.col(b), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def query_set(embeddings: DataFrame, every: int = 100) -> DataFrame:
    """Deterministic query subset: vec_id % every == 0."""
    return embeddings.where(F.col("vec_id") % every == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """(q_id, neighbor_id, rank, sim_e5) — exact top-k by cosine.

    The query side is broadcast: the big side streams map-side, no
    shuffle until the final per-query top-k (a tiny aggregate).
    """
    joined = embeddings.join(F.broadcast(queries), on=F.col("vec_id") != F.col("q_id"))
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    scored = joined.select(
        "q_id", F.col("vec_id").alias("neighbor_id"), sim_e5.alias("sim_e5")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_e5").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("rank").cast("long"), "sim_e5")
    )


@pandas_udf(ArrayType(IntegerType()))
def lsh_buckets_udf(emb: pd.Series) -> pd.Series:
    """Multi-table random-hyperplane signatures → one bucket id per
    table, namespaced by table index (one numpy tensordot per Arrow
    batch — no per-row Python)."""
    mat = np.stack(emb.map(np.asarray).values).astype(np.float64)
    planes = _hyperplanes(mat.shape[1])  # (T, B, D)
    bits = np.tensordot(mat, planes, axes=([1], [2])) > 0  # (n, T, B)
    vals = (bits * (1 << np.arange(_N_BITS))).sum(axis=2)  # (n, T)
    vals = vals + (np.arange(_N_TABLES) << _N_BITS)  # namespace per table
    return pd.Series(list(vals.astype(np.int32)))


def ann_lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Approximate top-k: candidates = union over tables of the query's
    bucket — the join key is (table-namespaced) bucket, never a cross
    join; duplicate candidates collapse before scoring."""
    emb_b = embeddings.select(
        "vec_id", "embedding",
        F.explode(lsh_buckets_udf(F.col("embedding"))).alias("bucket"),
    )
    q_b = queries.select(
        "q_id", "q_emb",
        F.explode(lsh_buckets_udf(F.col("q_emb"))).alias("bucket"),
    )
    joined = (
        emb_b.join(F.broadcast(q_b), on=["bucket"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_emb", "vec_id", "embedding")
        .dropDuplicates(["q_id", "vec_id"])
    )
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    scored = joined.select(
        "q_id", F.col("vec_id").alias("neighbor_id"), sim_e5.alias("sim_e5")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_e5").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("rank").cast("long"), "sim_e5")
    )


def embedding_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label norm statistics — JVM-side array math."""
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(ed, F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        embeddings.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 5).alias("avg_norm"),
            F.round(F.min("norm"), 5).alias("min_norm"),
            F.round(F.max("norm"), 5).alias("max_norm"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path alongside LSH
# ---------------------------------------------------------------------------

def label_centroids(embeddings: DataFrame) -> DataFrame:
    """(cell, centroid array<double>) — per-label mean vector.

    Labels are the deterministic coarse quantizer here (a k-means would
    converge to similar cells but is iteration-order dependent); at
    10^12 rows you'd train real centroids offline and broadcast them —
    the query shape below is identical either way."""
    exploded = embeddings.select(
        F.col("label").alias("cell"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos", "v"),
    )
    return (
        exploded.groupBy("cell", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("cell")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("s"))
        .select("cell", F.transform("s", lambda st: st["m"]).alias("centroid"))
    )


def _nearest_cells(
    vectors: DataFrame, centroids: DataFrame, id_col: str, emb_col: str, top: int
) -> DataFrame:
    """(id, cell) for each vector's ``top`` nearest centroids — the
    centroid table is tiny (one row per cell) and broadcast."""
    joined = vectors.join(F.broadcast(centroids))
    sim_e5 = F.floor(cosine_expr(emb_col, "centroid") * 100000)
    sel = joined.select(id_col, "cell", sim_e5.alias("_sim"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col("cell").asc()
    )
    return (
        sel.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= top)
        .select(id_col, "cell")
    )


def ann_ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10, n_probe: int = 2
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest centroid cell, probe
    each query's ``n_probe`` nearest cells, brute-force only inside the
    probed cells.  Candidates per query ≈ n_probe × n/|cells| — an
    equi-join on the cell key, never a cross join over the corpus."""
    cents = label_centroids(embeddings).localCheckpoint(eager=False)
    assign = _nearest_cells(embeddings, cents, "vec_id", "embedding", 1)
    emb_cells = embeddings.join(assign, "vec_id")
    q_cells = _nearest_cells(queries, cents, "q_id", "q_emb", n_probe).join(
        queries, "q_id"
    )
    cands = (
        emb_cells.join(F.broadcast(q_cells), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "vec_id"])
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
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("rank").cast("long"), "sim_e5")
    )
