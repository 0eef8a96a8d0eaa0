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


def _unique_text(i: int, n_words: int = 40) -> str:
    return " ".join(f"tok{i}x{j}" for j in range(n_words))


@pytest.fixture(scope="module")
def adversarial(spark):
    """10k identical-boilerplate docs + 5 distinct docs with injected
    exact (+1e9) and near (+2e9) duplicates — the hot-bucket corpus."""
    from rxtls_spark.operators.dedup import with_injected_dups

    base = spark.createDataFrame(
        [(i, _unique_text(i), "en") for i in range(0, 100, 20)],
        "doc_id long, text string, lang string",
    )
    boiler = spark.range(10_000).select(
        (F.col("id") + 500_000).alias("doc_id"),
        F.lit("the same boilerplate spam text on every mirror page").alias("text"),
        F.lit("en").alias("lang"),
    )
    return with_injected_dups(base).unionByName(boiler).cache()


def test_minhash_bucket_cap_bounds_hot_bucket(spark, adversarial):
    """With 10k docs in one bucket the capped pipeline must stay at
    O(injected²) candidates, still recover every injected pair, and
    report the dropped buckets (no silent caps)."""
    from rxtls_spark.operators.dedup import (
        lsh_banded,
        lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_near_dups,
        minhash_signatures,
    )

    sigs = minhash_signatures(adversarial).cache()
    cands = lsh_candidate_pairs(sigs, bucket_cap=1000).collect()
    # candidate count bounded: nothing from the 10k-doc bucket
    assert len(cands) < 200, len(cands)
    boiler_pairs = [
        c for c in cands if c["doc_a"] >= 500_000 and c["doc_b"] >= 500_000
        and c["doc_a"] < 1_000_000_000
    ]
    assert boiler_pairs == []

    pairs = {
        (p["doc_a"], p["doc_b"])
        for p in minhash_near_dups(adversarial, 0.7, bucket_cap=1000).collect()
    }
    for b in range(0, 100, 20):
        assert (b, b + 1_000_000_000) in pairs  # exact copy recovered
        assert (b, b + 2_000_000_000) in pairs  # near copy recovered

    drops = lsh_dropped_buckets(sigs, bucket_cap=1000).collect()
    # identical sigs → one hot bucket per band
    assert len(drops) == 16
    assert all(d["bucket_size"] == 10_000 for d in drops)
    # audit identity: dropped rows = banded rows in over-cap buckets
    banded_total = lsh_banded(sigs).count()
    kept = lsh_banded(sigs).count() - sum(d["bucket_size"] for d in drops)
    assert banded_total - kept == 160_000
    sigs.unpersist()


def test_bucket_cap_shuffled_fallback_is_value_identical(
    spark, adversarial, monkeypatch
):
    """The broadcast guard (BUCKET_CAP_BROADCAST_MAX): with the bound
    forced to 0 the cap must take the shuffled anti-join path and
    return the IDENTICAL candidate set — adversarial skew degrades to
    a shuffle, never to an OOM or a semantic change."""
    from rxtls_spark.operators import dedup

    sigs = dedup.minhash_signatures(adversarial).cache()
    want = {
        (c["doc_a"], c["doc_b"])
        for c in dedup.lsh_candidate_pairs(sigs, bucket_cap=1000).collect()
    }
    monkeypatch.setattr(dedup, "BUCKET_CAP_BROADCAST_MAX", 0)
    got = {
        (c["doc_a"], c["doc_b"])
        for c in dedup.lsh_candidate_pairs(sigs, bucket_cap=1000).collect()
    }
    sigs.unpersist()
    assert got == want


def test_simhash_bucket_cap_bounds_hot_bucket(spark, adversarial):
    from rxtls_spark.operators.dedup import (
        simhash_dropped_buckets,
        simhash_near_dups,
    )

    pairs = simhash_near_dups(adversarial, 3, bucket_cap=1000).collect()
    assert len(pairs) < 200, len(pairs)
    assert not any(
        p["doc_a"] >= 500_000 and p["doc_a"] < 1_000_000_000
        and p["doc_b"] >= 500_000 and p["doc_b"] < 1_000_000_000
        for p in pairs
    )
    got = {(p["doc_a"], p["doc_b"]): p["hamming"] for p in pairs}
    for b in range(0, 100, 20):
        assert got.get((b, b + 1_000_000_000)) == 0  # identical text
    drops = simhash_dropped_buckets(adversarial, bucket_cap=1000).collect()
    assert len(drops) == 4 and all(d["bucket_size"] == 10_000 for d in drops)


def test_jaccard_batch_equals_scalar():
    """The batched verify (one xxh3 call per Arrow batch) must agree
    with the per-row reference bit-for-bit on every edge shape."""
    import numpy as np

    from rxtls_spark.operators.dedup import _jaccard_batch, _jaccard_scalar

    rng = np.random.RandomState(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "x"]
    texts_a, texts_b = [], []
    for n in [0, 1, 2, 3, 5, 30, 100]:
        a = " ".join(rng.choice(words, n)) if n else ""
        b_words = a.split()
        if b_words and rng.rand() < 0.7:
            b_words[rng.randint(len(b_words))] = "MUT"
        texts_a.append(a)
        texts_b.append(" ".join(b_words))
    texts_a += ["same same same", None, "one two three four"]
    texts_b += ["same same same", "not empty", None]
    got = _jaccard_batch(texts_a, texts_b)
    exp = [_jaccard_scalar(a, b) for a, b in zip(texts_a, texts_b)]
    assert got == exp
    assert got[-3] == 1.0  # identical texts
    assert _jaccard_batch([], []) == []


def test_bloom_dedup_matches_sequential_python_bloom(spark):
    """Exact-equality replica: a genuinely SEQUENTIAL Python Bloom
    filter (insert in doc_id order, flag before insert) must agree
    with the order-free min-first-setter Spark formulation on every
    doc — proving the parallel rewrite IS the sequential semantics.
    Structural Bloom guarantees: zero 'missed' verdicts (no false
    negatives) and every exact dup flagged."""
    from rxtls_spark.queries_training import (
        BLOOM_H2_OFFSET,
        BLOOM_K,
        BLOOM_M_BITS,
        q_bloom_dedup,
    )
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from tests.conftest import SF_SMOKE
    import hashlib

    plan = plan_string(q_bloom_dedup(spark, SF_SMOKE), mode="simple")
    # first-setter table is bounded by M -> must come back as a broadcast
    assert "BroadcastHashJoin" in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    full = dict(docs)
    for d, t in docs.items():
        if d % 20 == 0:
            full[d + 1_000_000_000] = t
            full[d + 2_000_000_000] = t + " extra!"

    def kh(x):
        return ((x % KNUTH_P) * KNUTH_A) % KNUTH_P

    bits, seen_md5, want = set(), set(), {}
    for d in sorted(full):
        t = full[d]
        md5 = hashlib.md5(t.encode()).hexdigest()
        k = int(md5[:13], 16)
        pos = [(kh(k) + j * kh(k + BLOOM_H2_OFFSET)) % BLOOM_M_BITS
               for j in range(BLOOM_K)]
        bloom = int(all(p in bits for p in pos))
        exact = int(md5 in seen_md5)
        bits.update(pos)
        seen_md5.add(md5)
        verdict = ("dup" if exact and bloom else
                   "false_positive" if bloom else
                   "missed" if exact else "unique")
        want[d] = (exact, bloom, verdict)

    got = {
        r["doc_id"]: (r["exact_dup"], r["bloom_dup"], r["verdict"])
        for r in q_bloom_dedup(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert all(v[2] != "missed" for v in got.values())
    assert all(v[1] == 1 for v in got.values() if v[0] == 1)
    assert sum(v[0] for v in got.values()) > 0  # injected dups present


def test_cdc_chunk_dedup_matches_replica_and_shift_resilience(spark):
    """cdc_chunk_dedup vs a pure-Python replica (same md5-prefix
    boundary rule, fence array, first-setter min (doc_id, chunk_idx))
    over the smoke corpus — every per-doc row must match EXACTLY.
    Also locks the property CDC exists for: the injected near-copy
    (doc_id+2e9, ' extra!' appended) dedups every chunk except the
    final one against its original."""
    import hashlib
    import re

    from rxtls_spark.queries_training import CDC_DIV, q_cdc_chunk_dedup
    from tests.conftest import SF_SMOKE

    got = {r["doc_id"]: r for r in q_cdc_chunk_dedup(spark, SF_SMOKE).collect()}

    ws = re.compile(r"[ \t\n\x0B\f\r]+")
    base = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    docs = dict(base)
    for i, t in base.items():
        if i % 20 == 0:
            docs[i + 1_000_000_000] = t
            docs[i + 2_000_000_000] = t + " extra!"

    def md5hex(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    def chunks_of(text: str) -> list[tuple[str, int]]:
        toks = ws.split(text.strip().lower())
        ends = [
            i
            for i in range(1, len(toks) + 1)
            if i == len(toks)
            or int(md5hex(toks[i - 1])[:13], 16) % CDC_DIV == 0
        ]
        e2 = [0] + ends
        return [
            (md5hex(" ".join(toks[e2[k - 1]:e2[k]])), e2[k] - e2[k - 1])
            for k in range(1, len(e2))
        ]

    per_doc = {
        i: chunks_of(t) for i, t in docs.items() if t.strip() != ""
    }
    first = {}
    for i in sorted(per_doc):
        for idx, (h, _) in enumerate(per_doc[i]):
            first.setdefault(h, (i, idx))
    assert set(got) == set(per_doc)
    for i, ch in per_doc.items():
        dup = [(h, n) for idx, (h, n) in enumerate(ch) if first[h] != (i, idx)]
        r = got[i]
        assert r["n_chunks"] == len(ch), i
        assert r["n_tokens"] == sum(n for _, n in ch), i
        assert r["dup_chunks"] == len(dup), i
        assert r["saved_tokens"] == sum(n for _, n in dup), i

    # shift resilience: the near-copy's non-final chunks all dedup
    checked = 0
    for i in base:
        if i % 20 == 0 and base[i].strip() != "":
            near = i + 2_000_000_000
            ch = per_doc[near]
            for idx, (h, _) in enumerate(ch[:-1]):
                assert first[h] != (near, idx), (near, idx)
            assert got[near]["dup_chunks"] >= len(ch) - 1
            checked += 1
    assert checked > 0


def test_set_simjoin_no_false_negatives_vs_brute_force(spark):
    """The prefix-filter THEOREM checked empirically: the query's
    pair set equals the brute-force all-pairs Jaccard >= tau set
    exactly (no false negatives is the theorem; no false positives
    because verification is exact), with the same integer jacc_e6,
    and every injected exact-copy pair present at jacc == 1e6."""
    import re

    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import (
        PPJ_DEN,
        PPJ_NUM,
        q_set_simjoin,
    )
    from tests.conftest import SF_SMOKE

    base = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    docs = dict(base)
    for d, t in base.items():
        if d % 20 == 0:
            docs[d + 1_000_000_000] = t
            docs[d + 2_000_000_000] = t + " extra!"
    sets = {
        d: frozenset(re.split("[ \t\n\x0B\f\r]+", t.strip().lower()))
        for d, t in docs.items()
        if t.strip()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            if inter * PPJ_DEN >= PPJ_NUM * (len(sa) + len(sb) - inter):
                want[(a, b)] = (
                    len(sa),
                    len(sb),
                    inter,
                    inter * 10**6 // (len(sa) + len(sb) - inter),
                )

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_a"],
            r["n_b"],
            r["inter"],
            r["jacc_e6"],
        )
        for r in q_set_simjoin(spark, SF_SMOKE).collect()
    }
    assert got == want
    for d in base:
        if d % 20 == 0 and base[d].strip():
            assert got[(d, d + 1_000_000_000)][3] == 10**6


def test_blocking_quality_metrics_and_truth_coverage(spark):
    """Structural locks on the record-linkage metrics: counts
    reconcile (n_true == 3 × non-empty %20 base docs, n_found <=
    min(n_true, n_cand)), both ratios inside [0, 1e6], RR is HIGH
    (blocking must prune > 99% of the pair space — that is its job)
    and PC is HIGH (>= 90% of injected dup pairs share a block — the
    minhash bands are tuned for exactly these near-dups); exact-copy
    pairs specifically are ALWAYS found (identical signatures)."""
    from pyspark.sql import functions as F

    from rxtls_spark.queries_training import q_blocking_quality
    from tests.conftest import SF_SMOKE

    n_base = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where((F.col("doc_id") % 20 == 0) & (F.trim("text") != ""))
        .count()
    )
    got = q_blocking_quality(spark, SF_SMOKE).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_true_pairs"] == 3 * n_base
    assert 0 <= r["n_found"] <= min(r["n_true_pairs"], r["n_cand_pairs"])
    assert 0 <= r["pc_e6"] <= 10**6
    assert 0 <= r["rr_e6"] <= 10**6
    assert r["rr_e6"] >= 990000
    assert r["pc_e6"] >= 900000
    all_pairs = r["n_docs"] * (r["n_docs"] - 1) // 2
    assert r["rr_e6"] == 10**6 - r["n_cand_pairs"] * 10**6 // all_pairs
