"""Embedding-dedup tests: exact pairwise vs LSH recall, injected dups."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_dup(spark):
    from rxtls_spark.operators.embedding_dedup import with_injected_embedding_dups

    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return with_injected_embedding_dups(base).cache()


def test_exact_finds_injected_copies(spark, emb_dup):
    from rxtls_spark.operators.embedding_dedup import DUP_OFFSET, embedding_dup_pairs

    pairs = {
        (r["vec_a"], r["vec_b"]): r["sim_e5"]
        for r in embedding_dup_pairs(emb_dup, 0.8).collect()
    }
    injected = [
        r["vec_id"]
        for r in emb_dup.where(
            (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < DUP_OFFSET)
        ).collect()
    ]
    assert injected
    for v in injected:
        assert pairs.get((v, v + DUP_OFFSET)) in (99999, 100000), v  # cosine 1.0


def test_lsh_catches_exact_copies(spark, emb_dup):
    """Identical vectors share every LSH bucket — the scale variant must
    find 100% of exact copies (near-misses may drop; copies cannot)."""
    from rxtls_spark.operators.embedding_dedup import (
        DUP_OFFSET,
        embedding_dup_pairs_lsh,
    )

    got = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs_lsh(emb_dup, 0.8).collect()
    }
    injected = [
        r["vec_id"]
        for r in emb_dup.where(
            (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < DUP_OFFSET)
        ).collect()
    ]
    assert all((v, v + DUP_OFFSET) in got for v in injected)


def test_lsh_subset_of_exact(spark, emb_dup):
    from rxtls_spark.operators.embedding_dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = {(r["vec_a"], r["vec_b"]) for r in embedding_dup_pairs(emb_dup, 0.8).collect()}
    lsh = {(r["vec_a"], r["vec_b"]) for r in embedding_dup_pairs_lsh(emb_dup, 0.8).collect()}
    assert lsh <= exact


def test_semantic_dedup_drops_copies_cluster_scoped(spark):
    """SemDeDup: every injected copy is dropped with its original as
    keeper (identical embedding -> same cell, sim ~= 1.0); every victim
    shares a cell with its keeper; and the candidate join is an
    equi-join on cell (no nested-loop / cartesian pair enumeration)."""
    from rxtls_spark.operators.embedding_dedup import DUP_OFFSET
    from rxtls_spark.operators.similarity import ivf_assign_expr, train_ivf_centroids
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        KMEANS_ITERS,
        KMEANS_K,
        _emb,
        q_semantic_dedup,
    )
    from rxtls_spark.functions.hashing import knuth_hash
    from tests.conftest import SF_SMOKE

    df = q_semantic_dedup(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {r["vec_id"]: r for r in df.collect()}

    emb = _emb(spark, SF_SMOKE)
    injected = [
        r["vec_id"] for r in emb.where(F.col("vec_id") % 25 == 0).collect()
    ]
    assert injected
    for v in injected:
        row = got[v + DUP_OFFSET]
        assert row["keeper"] == v
        assert row["sim_e5"] >= 99999  # identical vectors, ulp-tolerant

    # victim and keeper always share the assigned cell
    cents = train_ivf_centroids(
        emb, k=KMEANS_K, iters=KMEANS_ITERS, metric="l2",
        seed_order=knuth_hash(F.col("vec_id")), round_dp=6,
    )
    from rxtls_spark.operators.embedding_dedup import (
        with_injected_embedding_dups,
    )

    cell_of = {
        r["vec_id"]: r["cell"]
        for r in with_injected_embedding_dups(emb)
        .select(
            "vec_id",
            ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
        )
        .collect()
    }
    for v, row in got.items():
        assert row["cell"] == cell_of[v] == cell_of[row["keeper"]]


def test_d4_prune_composes_semdedup_then_proto(spark):
    """D4 (Tirumala et al. 2023): stage 1 must drop EXACTLY the
    `semantic_dedup` victim set (same tau, same frozen quantizer);
    stage 2 then rank-prunes only the survivors — one verdict per
    vector, per-cell ranks dense 1..n, exactly floor(n*NUM/DEN)
    'proto' drops per cell, kept flag consistent.  Plan lock: the
    stage-1 candidate join stays an equi-join on cell."""
    from collections import defaultdict

    from rxtls_spark.operators.embedding_dedup import (
        with_injected_embedding_dups,
    )
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        PROTO_PRUNE_DEN,
        PROTO_PRUNE_NUM,
        _emb,
        q_d4_prune,
        q_semantic_dedup,
    )

    df = q_d4_prune(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    d4 = df.collect()
    victims = {
        r["vec_id"] for r in q_semantic_dedup(spark, SF_SMOKE).collect()
    }
    sem = {r["vec_id"] for r in d4 if r["verdict"] == "semdedup"}
    assert sem == victims and sem

    ids = [r["vec_id"] for r in d4]
    assert len(ids) == len(set(ids)), "one verdict per vector"
    n_uni = with_injected_embedding_dups(_emb(spark, SF_SMOKE)).count()
    assert len(ids) == n_uni, "every vector in the union gets a verdict"

    for r in d4:
        assert (r["kept"] == 1) == (r["verdict"] == "kept")
        if r["verdict"] == "semdedup":
            assert r["proto_e5"] is None and r["rnk"] is None
        else:
            assert r["proto_e5"] is not None and r["rnk"] >= 1

    by_cell = defaultdict(list)
    for r in d4:
        if r["verdict"] != "semdedup":
            by_cell[r["cell"]].append(r)
    for rows in by_cell.values():
        n = len(rows)
        assert sorted(r["rnk"] for r in rows) == list(range(1, n + 1))
        n_proto = sum(r["verdict"] == "proto" for r in rows)
        assert n_proto == (n * PROTO_PRUNE_NUM) // PROTO_PRUNE_DEN
        # the pruned vectors are the TOP-ranked (most prototypical)
        assert {r["rnk"] for r in rows if r["verdict"] == "proto"} == set(
            range(1, n_proto + 1)
        )


def test_mmr_select_matches_sequential_python_replica(spark):
    """MMR greedy selection must match a pure-Python replica EXACTLY:
    the replica folds dot/norm sums sequentially in index order —
    bit-identical IEEE doubles to the Spark zip_with/aggregate fold —
    then floors to e5 BIGINTs, so every pick, penalty, and score is
    compared with zero tolerance.  Also locks the invariants: ranks
    1..K, distinct vec_ids, the query vector excluded, pick 1 is the
    relevance argmax (pen 0), and penalties never decrease a later
    re-pick of the same candidate (clamped at 0)."""
    import math

    from rxtls_spark.queries_training import (
        MMR_K,
        MMR_LAM_DEN,
        MMR_LAM_NUM,
        q_mmr_select,
    )

    got = {r["rnk"]: r for r in q_mmr_select(spark, SF_SMOKE).collect()}
    assert sorted(got) == list(range(1, MMR_K + 1))
    assert len({r["vec_id"] for r in got.values()}) == MMR_K

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}

    def cos_e5(a, b):
        # sequential fold in index order == the Spark aggregate fold
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        c = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return math.floor(c * 100000)

    q_id = min(vecs)
    q_emb = vecs[q_id]
    rel = {i: cos_e5(v, q_emb) for i, v in vecs.items() if i != q_id}
    pen_w = MMR_LAM_DEN - MMR_LAM_NUM
    picked = []
    pen = {i: 0 for i in rel}
    for rnk in range(1, MMR_K + 1):
        if picked:
            last = vecs[picked[-1]]
            for i in pen:
                if i not in picked:
                    pen[i] = max(pen[i], cos_e5(vecs[i], last))
        best = min(
            (i for i in rel if i not in picked),
            key=lambda i: (-(MMR_LAM_NUM * rel[i] - pen_w * pen[i]), i),
        )
        picked.append(best)
        r = got[rnk]
        assert r["vec_id"] == best, rnk
        assert r["rel_e5"] == rel[best], rnk
        assert r["pen_e5"] == pen[best], rnk
        assert r["score_e5"] == MMR_LAM_NUM * rel[best] - pen_w * pen[best]
        assert r["pen_e5"] >= 0
    assert got[1]["pen_e5"] == 0
    assert got[1]["vec_id"] == min(rel, key=lambda i: (-rel[i], i))
