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
