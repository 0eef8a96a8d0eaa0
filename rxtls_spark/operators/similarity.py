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
query set (it's a map-side nested loop per row — no shuffle); the real
ANN routes are LSH (signatures: one numpy tensordot per Arrow batch),
IVF with trained k-means centroids, and IVF-PQ with exact re-rank (the
FAISS-canonical shape — candidates stream 8-byte codes, not vectors).
"""

from __future__ import annotations

import math

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


def _cosine_cols(a, b):
    """JVM-side cosine similarity of two array<float|double> Column
    expressions (zip_with/aggregate — whole-stage codegen, no Python)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_expr(a: str, b: str):
    """Name-based wrapper over `_cosine_cols`."""
    return _cosine_cols(F.col(a), F.col(b))


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin a scan up to the session's parallelism when it came
    in with fewer partitions: tiny gate-scale inputs arrive as 1-2
    splits and would otherwise run heavy per-row map work (quantizer
    assignment, PQ encode, cosine verifies) nearly single-task.  At
    corpus scale the scan already out-fans the cores — no-op, no
    shuffle added.  Only safe where downstream results are partition-
    order-free (per-row expressions, explicitly-ordered windows, or
    integer aggregation): a float-sum consumer would see a different
    fold order, so the kmeans TRAINING scan must never go through this."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


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
#
# Centroids are TRAINED (spherical k-means, `train_ivf_centroids`) and
# then passed around as plain driver-side metadata — a k×dim matrix,
# a few KB — baked into the query plan as a literal array of structs.
# That makes both cell assignment and query probing pure per-row JVM
# expressions: NO explode over the corpus, NO window shuffle, NO join
# for assignment.  The only shuffles in an IVF query are the cell
# equi-join and the final per-query top-k.

def _emb_dim(embeddings: DataFrame, emb_col: str = "embedding") -> int:
    return int(embeddings.select(F.size(emb_col)).head()[0])


def _sql_double(v: float) -> str:
    """Shortest round-trip SQL DOUBLE literal: ``repr(x) + 'D'``.
    Python repr emits the shortest digits that round-trip, and the SQL
    parser's Double.parseDouble is correctly rounded — so the JVM
    recovers the bit-identical IEEE double (pytest-locked vs F.lit on
    adversarial values).  The D suffix keeps ANSI from reading a bare
    decimal as DECIMAL (the decimal-literal-folding hazard)."""
    return repr(float(v)) + "D"


def _cents_lit(centroids: list[tuple]):
    """The centroid set as ONE literal array<struct<cell, centroid>>
    column — Catalyst folds it into the plan, every executor evaluates
    it for free (the broadcast-of-metadata pattern without a join).

    Built as a single F.expr SQL string: the per-element
    F.lit/F.array/F.struct form cost one py4j JVM round-trip per
    element — measured 13.8 s of DRIVER-side time in ann_ivf_pq alone
    (16.5k lit() calls); the one-string form is one round-trip total
    for the identical expression tree."""
    parts = []
    for cell, vec in centroids:
        if isinstance(cell, str):
            cs = "'" + cell.replace("'", "''") + "'"
        else:
            cs = str(int(cell))
        parts.append(
            "named_struct('cell'," + cs + ",'centroid',array("
            + ",".join(_sql_double(v) for v in vec) + "))"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def _dot_cols(a, b):
    """JVM dot product of two array columns (doubles)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _l2sq_cols(a, b):
    """JVM squared-L2 distance of two array columns (doubles)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign_expr(centroids: list[tuple], emb, metric: str = "cosine"):
    """Column: cell of the nearest centroid for ``emb`` (max cosine or
    min L2) — pure JVM transform/aggregate, ties break to the first
    (lowest) cell."""
    if metric == "cosine":
        score = F.transform(
            _cents_lit(centroids), lambda c: _cosine_cols(emb, c["centroid"])
        )
    else:
        score = F.transform(
            _cents_lit(centroids), lambda c: -_l2sq_cols(emb, c["centroid"])
        )
    pos = F.array_position(score, F.array_max(score)).cast("int") - 1
    return F.element_at(
        F.transform(_cents_lit(centroids), lambda c: c["cell"]), pos + 1
    )


def ivf_probe_expr(
    centroids: list[tuple], emb, n_probe: int, metric: str = "cosine"
):
    """Column: array of the ``n_probe`` nearest cell ids for ``emb``
    (sort by -sim / squared-L2 with cell tiebreak, slice) — per-row
    JVM, no window.  The l2 ordering is monotone-equivalent to the SQL
    oracle's list_distance (sqrt) ordering."""
    if metric == "cosine":
        key = lambda c: (-_cosine_cols(emb, c["centroid"])).alias("key")  # noqa: E731
    else:
        key = lambda c: _l2sq_cols(emb, c["centroid"]).alias("key")  # noqa: E731
    scored = F.transform(
        _cents_lit(centroids),
        lambda c: F.struct(key(c), c["cell"].alias("cell")),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, n_probe), lambda s: s["cell"]
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
    seed_order=None,
    round_dp: int = 9,
) -> list[tuple]:
    """Spherical k-means (Lloyd's) coarse quantizer — train ONCE, pass
    the result into every `ann_ivf_topk` call (at 10^12 rows: persist it
    to a tiny table and reload).

    Spark-first structure, the same loop MLlib's KMeans runs:
    - assignment is a per-row JVM argmax against the literal centroid
      array (no explode, no join, no Python);
    - the update is ONE k-row hash aggregate per iteration (per-dim
      `avg(element_at(...))` — map-side partial agg, k×dim output);
    - the k×dim centroid matrix lives on the driver between iterations
      (metadata-scale, like MLlib's cluster centers).

    Deterministic: seeds are the k lowest xxhash64(id) rows (or the k
    lowest ``seed_order`` rows when given — q_kmeans passes a Knuth
    multiplicative hash so the SQL oracle can mirror the seeding),
    assignment ties break to the lowest cell, means are rounded to
    ``round_dp`` decimals so run-to-run float-sum-order noise can't
    flip a boundary vector.  Rounding is the stable floor(x*s+0.5)/s
    form, NOT Python round(): Python rounds half-even while DuckDB
    rounds half-away, so the unrolled kmeans oracle would disagree on
    an exact-half mean (same flake class round5_stable exists for)."""
    dim = _emb_dim(embeddings, emb_col)
    order = F.xxhash64(id_col) if seed_order is None else seed_order
    seeds = (
        embeddings.orderBy(order, F.col(id_col))
        .select(emb_col)
        .limit(k)
        .collect()
    )
    cents = [(i, [float(v) for v in r[0]]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        cell = ivf_assign_expr(cents, F.col(emb_col), metric)
        means = embeddings.select(cell.alias("cell"), emb_col).groupBy("cell").agg(
            *[
                F.avg(F.element_at(F.col(emb_col), i + 1).cast("double")).alias(
                    f"m{i}"
                )
                for i in range(dim)
            ]
        )
        scale = 10.0 ** round_dp
        got = {
            r["cell"]: [
                math.floor(float(r[f"m{i}"]) * scale + 0.5) / scale
                for i in range(dim)
            ]
            for r in means.collect()
        }
        # empty cells keep their previous centroid
        cents = [(c, got.get(c, vec)) for c, vec in cents]
    return cents


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """(cell, centroid array<double>) — per-label mean vector, the
    deterministic ORACLE quantizer (labels stand in for trained cells
    in tests comparing quantizer quality).  Explode-free: one hash agg
    with dim per-element avgs, k×dim output."""
    dim = _emb_dim(embeddings)
    aggd = embeddings.groupBy(F.col("label").alias("cell")).agg(
        *[
            F.avg(F.element_at(F.col("embedding"), i + 1).cast("double")).alias(
                f"m{i}"
            )
            for i in range(dim)
        ]
    )
    return aggd.select(
        "cell", F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("centroid")
    )


def collect_centroids(centroid_df: DataFrame) -> list[tuple]:
    """A (cell, centroid) DataFrame → the list form the literal-array
    expressions take (k×dim — metadata-scale)."""
    return [
        (r["cell"], [float(v) for v in r["centroid"]])
        for r in centroid_df.collect()
    ]


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    centroids: list[tuple] | None = None,
    n_cells: int = 16,
    train_iters: int = 4,
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest trained-centroid
    cell, probe each query's ``n_probe`` nearest cells, brute-force only
    inside the probed cells.  Candidates per query ≈ n_probe × n/k — an
    equi-join on the cell key, never a cross join over the corpus.

    ``centroids`` is the trained quantizer (see `train_ivf_centroids`);
    pass it in so the corpus is never re-scanned to rebuild it — when
    omitted, training runs once inside this call (the offline step).
    Single-cell assignment means each (q_id, vec_id) candidate pair is
    generated at most once — no dedup pass needed."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, k=n_cells, iters=train_iters
        )
    emb_cells = embeddings.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(centroids, F.col("embedding")).alias("cell"),
    )
    q_cells = queries.select(
        "q_id",
        "q_emb",
        F.explode(ivf_probe_expr(centroids, F.col("q_emb"), n_probe)).alias(
            "cell"
        ),
    )
    cands = emb_cells.join(F.broadcast(q_cells), "cell").where(
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
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", F.col("rank").cast("long"), "sim_e5")
    )


# ---------------------------------------------------------------------------
# IVF-PQ — product quantization with exact re-rank (the FAISS-canonical
# shape for ANN at 10^9-10^12 vectors)
# ---------------------------------------------------------------------------
#
# PQ compresses each vector to m small codes (here m=8 codes of 4 bits
# for a 64-dim vector → 8 bytes instead of 256), so the candidate scan
# touches codes + a per-query lookup table instead of full vectors.
# Pipeline: IVF probe for candidates → PQ asymmetric-distance score
# (pure JVM: one LUT gather + sum per candidate) → keep top `rerank`
# → exact cosine re-rank of the survivors.  Codebooks, like the IVF
# centroids, are offline-trained driver metadata baked into the plan
# as literals; at 10^12 rows you train them on a deterministic sample
# and persist.


def train_pq(
    embeddings: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means codebooks: the D-dim vector is split
    into ``m`` contiguous subvectors, each quantized independently to
    ``ks`` centroids.  Returns codebooks[m][ks][D/m].  Training reuses
    the Lloyd's loop (JVM argmin assignment, one ks-row agg per
    iteration) on the sliced column; run it on a sample offline at
    corpus scale — the codebooks are a few KB of metadata."""
    from concurrent.futures import ThreadPoolExecutor

    dim = _emb_dim(embeddings, emb_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    def one(j: int) -> list:
        sliced = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(emb_col), j * sub + 1, sub).alias("embedding"),
        )
        cents = train_ivf_centroids(
            sliced, k=ks, iters=iters, metric="l2"
        )
        return [vec for _cell, vec in cents]

    # the m subspace quantizers are fully independent Lloyd's loops —
    # submit their (tiny per-iteration) Spark jobs from m threads so
    # the scheduler overlaps them instead of serializing ~m×iters job
    # latencies; results are index-ordered and bit-identical to the
    # sequential loop (each subspace's computation is untouched)
    with ThreadPoolExecutor(max_workers=m) as ex:
        return list(ex.map(one, range(m)))


def save_quantizer(
    spark,
    path: str,
    centroids: list[tuple] | None = None,
    codebooks: list | None = None,
) -> None:
    """Persist the offline-trained quantizer metadata (IVF centroids
    and/or PQ codebooks) as tiny parquet tables — the 10^12-row
    workflow the training docstrings prescribe: train once on a sample,
    persist, and every serving query reloads instead of retraining.
    Layout: ``<path>/centroids`` rows (cell, centroid array<double>);
    ``<path>/codebooks`` rows (subspace, code, centroid array<double>).
    Both are k×dim-scale (a few KB) regardless of corpus size."""
    if centroids is not None:
        spark.createDataFrame(
            [(int(c), [float(v) for v in vec]) for c, vec in centroids],
            "cell int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    if codebooks is not None:
        rows = [
            (j, c, [float(v) for v in vec])
            for j, book in enumerate(codebooks)
            for c, vec in enumerate(book)
        ]
        spark.createDataFrame(
            rows, "subspace int, code int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_quantizer(
    spark, path: str
) -> tuple[list[tuple] | None, list | None]:
    """(centroids, codebooks) back in the literal-expression form
    `ann_ivf_topk` / `ann_ivf_pq_topk` take.  Missing parts load as
    None so IVF-only quantizers round-trip too."""
    import os

    centroids = None
    if os.path.isdir(f"{path}/centroids"):
        centroids = [
            (int(r["cell"]), [float(v) for v in r["centroid"]])
            for r in spark.read.parquet(f"{path}/centroids")
            .orderBy("cell")
            .collect()
        ]
    codebooks = None
    if os.path.isdir(f"{path}/codebooks"):
        rows = (
            spark.read.parquet(f"{path}/codebooks")
            .orderBy("subspace", "code")
            .collect()
        )
        m = max(r["subspace"] for r in rows) + 1
        codebooks = [[] for _ in range(m)]
        for r in rows:
            codebooks[r["subspace"]].append(
                [float(v) for v in r["centroid"]]
            )
    return centroids, codebooks


def _book_lit(book: list[list[float]]):
    # one-string literal for the same reason as _cents_lit (py4j cost)
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in c) + ")" for c in book
        )
        + ")"
    )


def pq_encode_expr(codebooks: list, emb):
    """Column: array<int> of m PQ codes (argmin-L2 per subspace) —
    per-row JVM, ties to the lowest code."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = []
    for j in range(m):
        sv = F.slice(emb, j * sub + 1, sub)
        d2 = F.transform(_book_lit(codebooks[j]), lambda c: _l2sq_cols(sv, c))
        codes.append(F.array_position(d2, F.array_min(d2)).cast("int") - 1)
    return F.array(*codes)


def pq_lut_expr(codebooks: list, q_emb):
    """Column: array of m lookup tables, LUT[j][c] = dot(q_j, book[j][c])
    — computed once per QUERY row (tiny), making each candidate score a
    pure gather+sum."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    luts = []
    for j in range(m):
        qv = F.slice(q_emb, j * sub + 1, sub)
        luts.append(
            F.transform(_book_lit(codebooks[j]), lambda c: _dot_cols(qv, c))
        )
    return F.array(*luts)


def pq_score_expr(codes_col, luts_col):
    """Approximate dot(q, v) = Σ_j LUT[j][code_j] — the PQ asymmetric
    distance; one array gather + sum per candidate, no vector math."""
    picked = F.zip_with(codes_col, luts_col, lambda c, lut: F.get(lut, c))
    return F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)


def ann_ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
    centroids: list[tuple] | None = None,
    codebooks: list | None = None,
) -> DataFrame:
    """IVF-PQ with exact re-rank: probe ``n_probe`` cells, score every
    candidate with the PQ asymmetric distance (codes vs the query's
    LUT — no full-vector math on the wide candidate set), keep the top
    ``rerank`` per query, then re-rank those exactly by cosine.

    With ``rerank`` ≥ the candidate count this reduces to exact IVF
    search regardless of codebook quality (pytest-locked); at scale the
    PQ stage is what lets the candidate scan stream compressed codes
    instead of raw vectors."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings)
    if codebooks is None:
        codebooks = train_pq(embeddings)
    emb_cells = embeddings.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(centroids, F.col("embedding")).alias("cell"),
        pq_encode_expr(codebooks, F.col("embedding")).alias("codes"),
    )
    q_cells = queries.select(
        "q_id",
        "q_emb",
        pq_lut_expr(codebooks, F.col("q_emb")).alias("luts"),
        F.explode(ivf_probe_expr(centroids, F.col("q_emb"), n_probe)).alias(
            "cell"
        ),
    )
    cands = emb_cells.join(F.broadcast(q_cells), "cell").where(
        F.col("vec_id") != F.col("q_id")
    )
    approx = cands.withColumn(
        "pq_score", pq_score_expr(F.col("codes"), F.col("luts"))
    )
    w_pq = Window.partitionBy("q_id").orderBy(
        F.col("pq_score").desc(), F.col("vec_id").asc()
    )
    survivors = (
        approx.withColumn("_r", F.row_number().over(w_pq))
        .where(F.col("_r") <= rerank)
        .drop("_r", "pq_score", "codes", "luts", "cell")
    )
    sim_e5 = F.floor(cosine_expr("embedding", "q_emb") * 100000).cast("long")
    scored = survivors.select(
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
