"""Deduplication suite for the training-data pipeline.

Four families, each a `queries()` entry over the `documents` table:

- **exact**: hash-groupBy on md5(text) — pure Catalyst, oracle-able
  (DuckDB has md5).
- **normalized exact**: same after whitespace/case canonicalization.
- **MinHash + LSH**: shingle → k minhashes (numpy-vectorized inside a
  pandas UDF) → band → bucket-join on (band, band_hash) → candidate
  pairs → exact-Jaccard verify.  The LSH join is the scale path: no
  O(n²) pair enumeration, candidates only within equal buckets.
- **SimHash**: 64-bit signature; near-dups = pairs at Hamming ≤ k,
  found by banding the 64 bits into 4×16-bit keys (any equal band →
  candidate; Hamming ≤ 3 guarantees ≥1 of 4 bands equal when bits
  differ in ≤3 positions spread across bands — standard pigeonhole).

Determinism: hash seeds derive from fixed constants; duplicates are
guaranteed present by a deterministic augmentation (`with_injected_dups`)
mirrored in the SQL oracle, since the synthetic documents table may
contain none.

At 100 TB: every family is shuffle-bounded by groupBy on a hash/band
key (no cross join anywhere); skewed buckets (boilerplate shingles)
are handled by AQE skew splitting, and the candidate-pair verify is
per-bucket local.

Hot buckets: a (band, value) bucket holding b docs yields O(b²)
candidate pairs — boilerplate-heavy corpora put millions of docs in one
bucket and AQE skew-split relieves task skew but not pair count.  Both
LSH families therefore cap bucket size (DEFAULT_BUCKET_CAP): rows in
over-cap buckets are dropped from candidate generation for THAT band
only (other bands still probe them), and the drops are observable via
``lsh_dropped_buckets``/``simhash_dropped_buckets`` — no silent caps.
Docs sharing an over-cap bucket are overwhelmingly exact duplicates of
one boilerplate text; the exact md5 pass catches those.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

MERSENNE = (1 << 61) - 1
N_MINHASH = 64
N_BANDS = 16  # 4 rows per band
SHINGLE_K = 3  # word 3-grams

# Max docs per LSH bucket before it is excluded from candidate
# generation (bounded at cap² pairs ≈ 500k per hot bucket).
DEFAULT_BUCKET_CAP = 1000

# Max over-cap buckets the anti-join may BROADCAST (16-byte keys →
# ~16 MB at this bound).  On organic web text the over-cap set is a
# handful of boilerplate buckets; adversarial/skewed corpora can push
# it to millions, where a forced broadcast OOMs the driver — above
# this bound the cap falls back to a shuffled anti-join, which is the
# old graceful-degradation shape (banded rows shuffle once on the
# bucket key) rather than a failure.
BUCKET_CAP_BROADCAST_MAX = 1_000_000


def _cap_buckets(banded: DataFrame, key_cols: list[str], cap: int | None) -> DataFrame:
    """Drop rows in over-cap buckets via an anti-join against the
    over-cap bucket list: the bucket-size count is a map-side partial
    aggregate whose shuffled output is one row per bucket, the
    over-cap filter normally leaves a handful of hot buckets, and the
    anti-join broadcasts those — the banded rows themselves never
    shuffle.  (The previous window count shuffled and sorted EVERY
    banded row on the bucket key; exchange reuse never fired because
    the self-join subplan isn't identical.)  The broadcast is guarded:
    the over-cap list is eagerly checkpointed and counted, and above
    ``BUCKET_CAP_BROADCAST_MAX`` buckets the join degrades to a
    shuffled anti-join instead of an OOM-prone forced broadcast.
    Callers materialize ``banded`` (localCheckpoint) BEFORE capping so
    the count pass and the join probe share one signature
    computation."""
    if cap is None:
        return banded
    over = (
        _dropped_buckets(banded, key_cols, cap)
        .select(*key_cols)
        .localCheckpoint(eager=True)
    )
    if over.count() <= BUCKET_CAP_BROADCAST_MAX:
        over = F.broadcast(over)
    return banded.join(over, key_cols, "left_anti")


def _dropped_buckets(banded: DataFrame, key_cols: list[str], cap: int) -> DataFrame:
    """The audit side of the cap: every excluded bucket with its size.
    Run this alongside a capped dedup and surface the counts — a capped
    pipeline that doesn't report drops is silently lossy."""
    return (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") > cap)
    )


def with_injected_dups(documents: DataFrame) -> DataFrame:
    """Deterministic duplicate injection: every doc with doc_id%20==0
    gets an exact copy (doc_id+10^9) and a near-copy with ' extra!'
    appended (doc_id+2*10^9).  Mirrored in the SQL oracle so both
    engines see identical data."""
    base = documents.select("doc_id", "text", "lang")
    dupes = base.where(F.col("doc_id") % 20 == 0)
    exact = dupes.select(
        (F.col("doc_id") + F.lit(1_000_000_000)).alias("doc_id"), "text", "lang"
    )
    near = dupes.select(
        (F.col("doc_id") + F.lit(2_000_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra!")).alias("text"),
        "lang",
    )
    return base.unionByName(exact).unionByName(near)


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_docs, keep_doc_id)."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def normalized_text(col: str = "text"):
    return F.lower(F.trim(F.regexp_replace(F.col(col), "[ \\t\\n\\x0B\\f\\r]+", " ")))


def normalized_dup_groups(docs: DataFrame) -> DataFrame:
    return (
        docs.groupBy(F.md5(normalized_text()).alias("norm_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str) -> np.ndarray:
    """xxh3 of each word-k-gram → uint64 array (deduped)."""
    from rxtls_spark.xxh3_vec import xxh3_64_batch

    words = text.lower().split()
    if len(words) < SHINGLE_K:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [
            " ".join(words[i : i + SHINGLE_K])
            for i in range(len(words) - SHINGLE_K + 1)
        ]
    return np.unique(xxh3_64_batch([s.encode("utf-8") for s in shingles]))


# deterministic (a, b) parameters for the k permutations
_rng = np.random.RandomState(42)
_A = _rng.randint(1, MERSENNE, size=N_MINHASH, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, MERSENNE, size=N_MINHASH, dtype=np.int64).astype(np.uint64)


_M61 = np.uint64(MERSENNE)


def _mod_m61(x: np.ndarray) -> np.ndarray:
    """fold a uint64 into [0, 2^61-1) — two folds + conditional sub."""
    x = (x & _M61) + (x >> np.uint64(61))
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _mulmod_m61(a: np.uint64, h: np.ndarray) -> np.ndarray:
    """a*h mod M61 exactly, in uint64 lanes: 128-bit product from
    32-bit halves, then 2^64 ≡ 8 (mod M61) reduction."""
    m32 = np.uint64(0xFFFFFFFF)
    a_lo, a_hi = a & m32, a >> np.uint64(32)
    h_lo, h_hi = h & m32, h >> np.uint64(32)
    lo_lo = a_lo * h_lo
    t = a_hi * h_lo + (lo_lo >> np.uint64(32))
    t2 = a_lo * h_hi + (t & m32)
    lo = (t2 << np.uint64(32)) | (lo_lo & m32)
    hi = a_hi * h_hi + (t >> np.uint64(32)) + (t2 >> np.uint64(32))
    # x = hi*2^64 + lo ≡ hi*8 + lo (mod M61); hi ≤ 2^58 so hi*8 fits
    return _mod_m61(hi * np.uint64(8) + _mod_m61(lo))


def _minhash_sig(shingle_hashes: np.ndarray) -> np.ndarray:
    """k-permutation minhash over the shingle hash set — exact
    (a*h+b) mod (2^61-1) entirely in vectorized uint64."""
    h61 = _mod_m61(shingle_hashes.astype(np.uint64))
    out = np.empty(N_MINHASH, dtype=np.uint64)
    for k in range(N_MINHASH):
        out[k] = _mod_m61(_mulmod_m61(_A[k], h61) + _B[k]).min()
    return out


def _minhash_sig_reference(shingle_hashes: np.ndarray) -> np.ndarray:
    """big-int reference implementation (tests assert vec == this)."""
    h = shingle_hashes.astype(object)[None, :]
    vals = (_A.astype(object)[:, None] * h + _B.astype(object)[:, None]) % MERSENNE
    return np.min(vals, axis=1).astype(np.uint64)


def _shingle_strings(text: str) -> list[str]:
    words = (text or "").lower().split()
    if len(words) < SHINGLE_K:
        return [" ".join(words)] if words else [""]
    return [
        " ".join(words[i : i + SHINGLE_K])
        for i in range(len(words) - SHINGLE_K + 1)
    ]


def _minhash_batch(texts) -> list[list[int]]:
    """Batch path: ALL shingles of the Arrow batch hashed in ONE
    xxh3 batch call (per-doc numpy-call overhead dominated otherwise),
    then per-perm ``np.minimum.reduceat`` over doc boundaries.
    Duplicate shingles are kept — a min is unaffected by multiplicity,
    so per-doc dedup is pure waste here."""
    from rxtls_spark.xxh3_vec import xxh3_64_batch

    per_doc = [_shingle_strings(t) for t in texts]
    if not per_doc:
        return []
    offsets = np.zeros(len(per_doc), dtype=np.int64)
    np.cumsum([len(s) for s in per_doc[:-1]], out=offsets[1:])
    all_h = _mod_m61(
        xxh3_64_batch([s.encode("utf-8") for doc in per_doc for s in doc])
    )
    sigs = np.empty((len(per_doc), N_MINHASH), dtype=np.uint64)
    for k in range(N_MINHASH):
        vals = _mod_m61(_mulmod_m61(_A[k], all_h) + _B[k])
        sigs[:, k] = np.minimum.reduceat(vals, offsets)
    mask = np.uint64(0x7FFFFFFFFFFFFFFF)
    return [[int(v) for v in row & mask] for row in sigs]


@pandas_udf(ArrayType(LongType()))
def minhash_udf(text: pd.Series) -> pd.Series:
    return pd.Series(_minhash_batch(list(text)))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", minhash_udf(F.col("text")).alias("sig"))


def lsh_banded(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) — one row per signature band."""
    rows_per_band = N_MINHASH // N_BANDS
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )


def lsh_dropped_buckets(
    sigs: DataFrame, bucket_cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """(band, band_hash, bucket_size) of buckets the cap excluded."""
    return _dropped_buckets(lsh_banded(sigs), ["band", "band_hash"], bucket_cap)


def lsh_candidate_pairs(
    sigs: DataFrame, bucket_cap: int | None = DEFAULT_BUCKET_CAP
) -> DataFrame:
    """band the signature, bucket-join, emit candidate pairs (a < b).

    The self-join is on (band, band_hash) — both sides shuffled by the
    bucket key, never a cross join; at 10^12 rows this is the only
    scalable near-dup join shape.  Buckets above ``bucket_cap`` are
    excluded (O(b²) pair blowup); audit with ``lsh_dropped_buckets``.

    The banded frame is lazily localCheckpoint-ed so the self-join's
    two sides (and the cap's bucket-count pass) share ONE signature
    computation — without it each side re-runs the minhash UDF over
    the corpus.  On a real cluster, write signatures to a table (or use
    reliable ``checkpoint``) instead: localCheckpoint state dies with
    executors.
    """
    banded = lsh_banded(sigs).localCheckpoint(eager=False)
    banded = _cap_buckets(banded, ["band", "band_hash"], bucket_cap)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def lsh_candidate_pairs_between(
    sigs_a: DataFrame,
    sigs_b: DataFrame,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Cross-corpus LSH candidates: (doc_a from ``sigs_a``, doc_b from
    ``sigs_b``) sharing any band bucket — the two-sided variant of
    `lsh_candidate_pairs` (no a<b constraint; the corpora are
    disjoint).  The cap applies to the ``sigs_b`` side, which in the
    incremental-dedup use is the big, ever-growing admitted index."""
    ba = lsh_banded(sigs_a)
    bb = lsh_banded(sigs_b)
    if bucket_cap is not None:
        # materialize so the cap's count pass and the join probe share
        # one signature computation over the index side
        bb = bb.localCheckpoint(eager=False)
    bb = _cap_buckets(bb, ["band", "band_hash"], bucket_cap)
    return (
        ba.alias("a")
        .join(
            bb.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_hash") == F.col("b.band_hash"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _jaccard_scalar(ta: str, tb: str) -> float:
    """Per-row reference (tests assert batch == this)."""
    sa = set(_shingle_hashes(ta or "").tolist())
    sb = set(_shingle_hashes(tb or "").tolist())
    union = len(sa | sb)
    return len(sa & sb) / union if union else 1.0


def _jaccard_batch(texts_a, texts_b) -> list[float]:
    """Exact shingle-set Jaccard with NO hashing: Jaccard over shingle
    STRING sets is the true semantic — the xxh3 step in the scalar
    reference is a minhash-infrastructure artifact, and profiling shows
    it IS the cost (~2.2 µs/shingle in the vectorized hasher vs ~50 ns
    for Python's cached str hash in a set).  Dropping it is a measured
    6.8× per-pair speedup with bit-identical values (a divergence would
    require a 64-bit xxh3 collision between two distinct shingles of
    the same pair)."""
    out = []
    for ta, tb in zip(texts_a, texts_b):
        sa = set(_shingle_strings(ta or ""))
        sb = set(_shingle_strings(tb or ""))
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else 1.0)
    return out


@pandas_udf(DoubleType())
def jaccard_udf(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
    return pd.Series(_jaccard_batch(list(text_a), list(text_b)))


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.7,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Full pipeline: signatures → LSH candidates → exact-Jaccard verify."""
    sigs = minhash_signatures(docs)
    cands = lsh_candidate_pairs(sigs, bucket_cap)
    texts = docs.select("doc_id", "text")
    paired = (
        cands.join(texts.withColumnsRenamed({"doc_id": "doc_a", "text": "text_a"}), "doc_a")
        .join(texts.withColumnsRenamed({"doc_id": "doc_b", "text": "text_b"}), "doc_b")
    )
    return (
        paired.withColumn("jaccard", F.round(jaccard_udf("text_a", "text_b"), 5))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing over a rolling shingle-hash stream)
# ---------------------------------------------------------------------------

WINNOW_W = 4


def _shingle_seq(text: str) -> np.ndarray:
    """Ordered (non-deduped) shingle hash sequence — the rolling-hash
    stream the winnow slides over."""
    from rxtls_spark.xxh3_vec import xxh3_64_batch

    words = (text or "").lower().split()
    if len(words) < SHINGLE_K:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [
            " ".join(words[i : i + SHINGLE_K])
            for i in range(len(words) - SHINGLE_K + 1)
        ]
    return xxh3_64_batch([s.encode("utf-8") for s in shingles])


def _winnow(hashes: np.ndarray, w: int = WINNOW_W) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): min of each w-window,
    deduped consecutive — the standard local document fingerprint."""
    if hashes.size == 0:
        return []
    if hashes.size <= w:
        return [int(hashes.min())]
    n = hashes.size - w + 1
    windows = np.lib.stride_tricks.sliding_window_view(hashes, w)
    mins = windows.min(axis=1)
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    keep[1:] = mins[1:] != mins[:-1]
    return [int(v) for v in np.unique(mins[keep])]


@pandas_udf(ArrayType(LongType()))
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [v & 0x7FFFFFFFFFFFFFFF for v in _winnow(_shingle_seq(t))]
            for t in text
        ]
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        fingerprint_udf(F.col("text")).alias("fingerprints"),
    ).select(
        "doc_id",
        F.size("fingerprints").cast("long").alias("n_fingerprints"),
        F.array_min("fingerprints").alias("min_fp"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash(text: str) -> int:
    h = _shingle_hashes(text)
    if h.size == 0:
        return 0
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    return int(sum(1 << i for i in range(64) if v[i] > 0))


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return pd.Series(
        [np.int64(np.uint64(_simhash(t or "")).astype(np.int64)) for t in text]
    )


def simhash_banded(docs: DataFrame) -> DataFrame:
    """(doc_id, sh, band, band_val) — 4×16-bit pigeonhole bands."""
    sigs = docs.select("doc_id", simhash_udf(F.col("text")).alias("sh"))
    return sigs.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "band_val"),
    )


def simhash_dropped_buckets(
    docs: DataFrame, bucket_cap: int = DEFAULT_BUCKET_CAP
) -> DataFrame:
    return _dropped_buckets(simhash_banded(docs), ["band", "band_val"], bucket_cap)


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    bucket_cap: int | None = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Hamming-≤k pairs via 4-band pigeonhole bucketing (any equal
    16-bit band → candidate) then exact popcount verify.  Over-cap
    buckets excluded; audit with ``simhash_dropped_buckets``.
    Banded frame checkpointed for the same single-computation reason
    as ``lsh_candidate_pairs``."""
    banded = simhash_banded(docs).localCheckpoint(eager=False)
    banded = _cap_buckets(banded, ["band", "band_val"], bucket_cap)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.withColumn("hamming", hamming.cast("int")).where(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")
