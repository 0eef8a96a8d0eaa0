"""Dedup-suite semantics: LSH candidate generation must find the
injected duplicates, Jaccard verification must match a brute-force
python recomputation, SimHash Hamming pairs must match exact popcount
over all pairs (small data ⇒ brute force is feasible as the oracle)."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from rxtls_spark.operators.dedup import with_injected_dups

    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return with_injected_dups(base).cache()


def test_exact_dups_find_injected(spark, docs):
    from rxtls_spark.operators.dedup import exact_dup_groups

    groups = exact_dup_groups(docs).collect()
    # every doc_id%20==0 doc got an exact copy → ≥ n/20 groups
    n_base = docs.where(F.col("doc_id") < 1_000_000_000).count()
    assert len(groups) >= n_base // 20
    assert all(g["n_docs"] >= 2 for g in groups)
    # keep_doc_id is the min of each group → always a base id
    assert all(g["keep_doc_id"] < 1_000_000_000 for g in groups)


def test_minhash_finds_exact_and_near_dups(spark, docs):
    from rxtls_spark.operators.dedup import minhash_near_dups

    pairs = minhash_near_dups(docs, threshold=0.7).collect()
    found = {(p["doc_a"], p["doc_b"]): p["jaccard"] for p in pairs}
    base_ids = [
        r["doc_id"]
        for r in docs.where(
            (F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 1_000_000_000)
        ).collect()
    ]
    hit_exact = sum(1 for b in base_ids if (b, b + 1_000_000_000) in found)
    hit_near = sum(1 for b in base_ids if (b, b + 2_000_000_000) in found)
    # exact copies: jaccard 1.0, must essentially all be found
    assert hit_exact >= 0.95 * len(base_ids)
    for b in base_ids:
        if (b, b + 1_000_000_000) in found:
            assert found[(b, b + 1_000_000_000)] == 1.0
    # near copies (one appended shingle): high jaccard, most found
    assert hit_near >= 0.8 * len(base_ids)


def test_minhash_jaccard_matches_bruteforce(spark, docs):
    from rxtls_spark.operators.dedup import _shingle_hashes, minhash_near_dups

    pairs = minhash_near_dups(docs, threshold=0.7).limit(50).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for p in pairs:
        sa = set(_shingle_hashes(texts[p["doc_a"]]).tolist())
        sb = set(_shingle_hashes(texts[p["doc_b"]]).tolist())
        exact = len(sa & sb) / len(sa | sb)
        assert abs(p["jaccard"] - exact) < 1e-4


def test_simhash_pairs_match_bruteforce(spark, docs):
    from rxtls_spark.operators.dedup import _simhash, simhash_near_dups

    got = {
        (p["doc_a"], p["doc_b"]): p["hamming"]
        for p in simhash_near_dups(docs, max_hamming=3).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    sh = {i: _simhash(t) for i, t in texts.items()}
    expected = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        h = bin(sh[a] ^ sh[b]).count("1")
        if h <= 3:
            expected[(a, b)] = h
    assert got == expected


def test_fingerprints_shape(spark, docs):
    from rxtls_spark.operators.dedup import doc_fingerprints

    fp = doc_fingerprints(docs.limit(100)).collect()
    assert all(r["n_fingerprints"] >= 1 for r in fp if r["n_fingerprints"] is not None)


def test_winnow_properties():
    from rxtls_spark.operators.dedup import _winnow

    h = np.array([5, 3, 8, 1, 9, 2, 7], dtype=np.uint64)
    fps = _winnow(h, w=3)
    # every fingerprint is a real window minimum
    mins = {min(h[i : i + 3]) for i in range(len(h) - 2)}
    assert set(fps) <= {int(v) for v in mins}
    assert _winnow(np.array([], dtype=np.uint64)) == []
    assert _winnow(np.array([7, 7], dtype=np.uint64)) == [7]


def test_minhash_vectorized_equals_bigint_reference():
    """The uint64 mod-Mersenne path must equal exact big-int math."""
    import random

    from rxtls_spark.operators.dedup import (
        _minhash_batch,
        _minhash_sig_reference,
        _shingle_hashes,
    )

    rng = random.Random(3)
    texts = [
        " ".join("w%d" % rng.randrange(500) for _ in range(rng.randrange(1, 150)))
        for _ in range(100)
    ] + ["", "one", "one two", "a b c d e f"]
    batch = _minhash_batch(texts)
    for t, row in zip(texts, batch):
        exp = [
            int(v) & 0x7FFFFFFFFFFFFFFF
            for v in _minhash_sig_reference(_shingle_hashes(t))
        ]
        assert row == exp, t[:40]
