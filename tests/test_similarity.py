"""Similarity-search tests: brute-force top-k vs a numpy recomputation,
LSH ANN recall vs brute force, embedding stats sanity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, every=100, k=10):
    norms = np.linalg.norm(mat, axis=1)
    result = {}
    for qi in np.nonzero(ids % every == 0)[0]:
        sims = (mat @ mat[qi]) / (norms * norms[qi])
        sim_e5 = np.floor(sims * 100000).astype(np.int64)
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-sim_e5[i], ids[i]),
        )[:k]
        result[int(ids[qi])] = [(int(ids[i]), int(sim_e5[i])) for i in order]
    return result


def test_brute_force_topk_matches_numpy(spark, emb, emb_np):
    from rxtls_spark.operators.similarity import brute_force_topk, query_set

    got = {}
    for r in brute_force_topk(emb, query_set(emb), k=10).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["neighbor_id"], r["sim_e5"]))
    ids, mat = emb_np
    exp = _numpy_topk(ids, mat)
    assert set(got) == set(exp)
    for q, neighbors in exp.items():
        ranked = [(nid, s) for _rk, nid, s in sorted(got[q])]
        assert ranked == neighbors, q


def test_ann_lsh_recall(spark, emb, emb_np):
    from rxtls_spark.operators.similarity import ann_lsh_topk, query_set

    ids, mat = emb_np
    exact = _numpy_topk(ids, mat, k=10)
    got = {}
    for r in ann_lsh_topk(emb, query_set(emb), k=10).collect():
        got.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    # bucketed ANN trades recall for candidate-set size; require that it
    # returns something for most queries and recall@10 ≥ 0.2 on average
    assert len(got) >= 0.8 * len(exact)
    recalls = [
        len(got.get(q, set()) & {n for n, _ in exact[q]}) / 10 for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.2


def test_lsh_bucket_determinism(spark, emb):
    from rxtls_spark.operators.similarity import lsh_buckets_udf

    a = emb.select("vec_id", lsh_buckets_udf("embedding").alias("b")).collect()
    b = emb.select("vec_id", lsh_buckets_udf("embedding").alias("b")).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    buckets = {v for r in a for v in r["b"]}
    assert len(buckets) > 50  # spreads over the 8×64 namespaced buckets


def test_embedding_stats(spark, emb):
    from rxtls_spark.operators.similarity import embedding_stats

    rows = embedding_stats(emb).collect()
    assert sum(r["n"] for r in rows) == emb.count()
    assert all(r["min_norm"] <= r["avg_norm"] <= r["max_norm"] for r in rows)


@pytest.fixture(scope="module")
def ivf_cents(emb):
    from rxtls_spark.operators.similarity import train_ivf_centroids

    return train_ivf_centroids(emb, k=8, iters=3)


def test_ivf_training_is_deterministic_and_covers(spark, emb, ivf_cents):
    """Retraining on the same data must reproduce the centroids bit-for-
    bit (seeded init, lowest-cell tiebreak, rounded means), and the
    trained quantizer must actually partition the corpus (every cell
    non-empty — k-means collapsed cells would gut IVF selectivity)."""
    from pyspark.sql import functions as F

    from rxtls_spark.operators.similarity import (
        ivf_assign_expr,
        train_ivf_centroids,
    )

    again = train_ivf_centroids(emb, k=8, iters=3)
    assert again == ivf_cents
    sizes = {
        r["cell"]: r["n"]
        for r in emb.select(
            ivf_assign_expr(ivf_cents, F.col("embedding")).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(sizes) == 8 and all(v > 0 for v in sizes.values())


def test_ivf_training_improves_objective(spark, emb, ivf_cents):
    """More Lloyd's iterations must not worsen the spherical-k-means
    objective (mean cosine of each vector to its assigned centroid)."""
    from pyspark.sql import functions as F

    from rxtls_spark.operators.similarity import (
        _cents_lit,
        _cosine_cols,
        train_ivf_centroids,
    )

    def objective(cents):
        sims = F.transform(
            _cents_lit(cents),
            lambda c: _cosine_cols(F.col("embedding"), c["centroid"]),
        )
        return emb.select(F.array_max(sims).alias("s")).agg(
            F.avg("s")
        ).head()[0]

    o1 = objective(train_ivf_centroids(emb, k=8, iters=1))
    o3 = objective(ivf_cents)
    assert o3 >= o1 - 1e-9


def test_ann_ivf_recall_and_determinism(spark, emb, emb_np, ivf_cents):
    """IVF with trained centroids: every query returns k candidates,
    results are a deterministic function of (data, centroids), and
    recall@10 clears the bar probing 2 of 8 cells (~25% of the
    corpus)."""
    from rxtls_spark.operators.similarity import ann_ivf_topk, query_set

    ids, mat = emb_np
    exact = _numpy_topk(ids, mat, k=10)
    got = {}
    for r in ann_ivf_topk(
        emb, query_set(emb), k=10, n_probe=2, centroids=ivf_cents
    ).collect():
        got.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(exact)  # every query answered
    recalls = [
        len(got.get(q, set()) & {n for n, _ in exact[q]}) / 10 for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.2
    # determinism: a rerun (including retraining inside the call)
    # returns exactly the same sets
    again = {}
    for r in ann_ivf_topk(
        emb, query_set(emb), k=10, n_probe=2, n_cells=8, train_iters=3
    ).collect():
        again.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    assert again == got


def test_ann_ivf_full_probe_equals_brute_force(spark, emb, emb_np, ivf_cents):
    """Probing EVERY cell must reduce IVF to exact brute force — holds
    for any quantizer, so it pins the join/scoring machinery."""
    from rxtls_spark.operators.similarity import ann_ivf_topk, query_set

    ids, mat = emb_np
    exact = _numpy_topk(ids, mat, k=10)
    got = {}
    for r in ann_ivf_topk(
        emb, query_set(emb), k=10, n_probe=len(ivf_cents), centroids=ivf_cents
    ).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["neighbor_id"]))
    for q, neighbors in exact.items():
        assert [n for _rk, n in sorted(got[q])] == [n for n, _ in neighbors], q


def test_ann_ivf_plan_has_no_corpus_explode(spark, emb, ivf_cents):
    """The round-2 verdict flagged a full-corpus posexplode in the
    centroid build; with trained literal centroids the IVF query plan
    must contain no posexplode at all and only the tiny query-side
    probe explode."""
    from rxtls_spark.operators.similarity import ann_ivf_topk, query_set

    from rxtls_spark.plans.checks import plan_string

    plan = plan_string(
        ann_ivf_topk(emb, query_set(emb), k=10, n_probe=2, centroids=ivf_cents),
        "formatted",
    )
    assert "posexplode" not in plan.lower()


@pytest.fixture(scope="module")
def pq_books(emb):
    from rxtls_spark.operators.similarity import train_pq

    return train_pq(emb, m=8, ks=16, iters=2)


def test_pq_training_and_encoding_deterministic(spark, emb, pq_books):
    from pyspark.sql import functions as F

    from rxtls_spark.operators.similarity import pq_encode_expr, train_pq

    assert len(pq_books) == 8 and all(len(b) == 16 for b in pq_books)
    assert all(len(c) == 8 for b in pq_books for c in b)  # 64/8 dims
    again = train_pq(emb, m=8, ks=16, iters=2)
    assert again == pq_books
    codes = emb.select(
        "vec_id", pq_encode_expr(pq_books, F.col("embedding")).alias("c")
    ).collect()
    assert all(len(r["c"]) == 8 and all(0 <= v < 16 for v in r["c"]) for r in codes)
    codes2 = emb.select(
        "vec_id", pq_encode_expr(pq_books, F.col("embedding")).alias("c")
    ).collect()
    assert sorted(map(str, codes)) == sorted(map(str, codes2))


def test_ann_ivf_pq_full_probe_full_rerank_is_exact(spark, emb, emb_np, ivf_cents, pq_books):
    """With every cell probed and rerank >= corpus size, IVF-PQ must
    reduce to exact brute force REGARDLESS of codebook quality — pins
    the probe/join/score/re-rank machinery."""
    from rxtls_spark.operators.similarity import ann_ivf_pq_topk, query_set

    ids, mat = emb_np
    exact = _numpy_topk(ids, mat, k=10)
    got = {}
    for r in ann_ivf_pq_topk(
        emb, query_set(emb), k=10,
        n_probe=len(ivf_cents), rerank=len(ids) + 1,
        centroids=ivf_cents, codebooks=pq_books,
    ).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["neighbor_id"]))
    for q, neighbors in exact.items():
        assert [n for _rk, n in sorted(got[q])] == [n for n, _ in neighbors], q


def test_ann_ivf_pq_recall(spark, emb, emb_np, ivf_cents, pq_books):
    """Default IVF-PQ (probe 2/8 cells, rerank 50) clears the same
    recall bar as plain IVF — PQ prefiltering must not gut recall when
    the rerank budget covers the candidate sets."""
    from rxtls_spark.operators.similarity import ann_ivf_pq_topk, query_set

    ids, mat = emb_np
    exact = _numpy_topk(ids, mat, k=10)
    got = {}
    for r in ann_ivf_pq_topk(
        emb, query_set(emb), k=10, n_probe=2, rerank=50,
        centroids=ivf_cents, codebooks=pq_books,
    ).collect():
        got.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(exact)
    recalls = [
        len(got.get(q, set()) & {n for n, _ in exact[q]}) / 10 for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.2


def test_kmeans_query_matches_numpy_lloyds(spark):
    """q_kmeans's Spark training loop must equal an independent numpy
    re-implementation of the same deterministic Lloyd's spec (Knuth
    seeds, L2 argmin with lowest-cell ties, 6-dp rounded means) —
    centroids exactly, counts exactly."""
    from rxtls_spark.queries_training import q_kmeans

    rows = q_kmeans(spark, SF_SMOKE).collect()
    got_c = {}
    got_n = {}
    for r in rows:
        got_c.setdefault(r["cell"], {})[r["i"]] = r["m"]
        got_n[r["cell"]] = r["n_vecs"]

    data = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in data])
    X = np.array([[float(v) for v in r["embedding"]] for r in data])
    order = np.lexsort((ids, (ids * 2654435761) % 1000000007))
    cents = X[order[:8]].copy()
    for _ in range(3):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        asg = d.argmin(axis=1)  # argmin ties -> lowest index, same rule
        for c in range(8):
            if (asg == c).any():
                # stable floor(x*1e6+0.5)/1e6 round, same as the engine
                cents[c] = np.floor(X[asg == c].mean(axis=0) * 1e6 + 0.5) / 1e6
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    asg = d.argmin(axis=1)
    for c in range(8):
        exp = cents[c]
        got = np.array([got_c[c][i] for i in range(64)])
        # fold-sum vs numpy mean: identical after the 6-dp round
        assert np.abs(got - exp).max() <= 1e-6, c
        assert got_n[c] == int((asg == c).sum()), c


def test_quantizer_persistence_roundtrip(spark, tmp_path):
    """Offline-train → persist → reload → serve: the reloaded quantizer
    is exactly the trained one, and IVF-PQ search with it returns the
    identical result frame."""
    from rxtls_spark.operators.similarity import (
        ann_ivf_pq_topk,
        load_quantizer,
        query_set,
        save_quantizer,
        train_ivf_centroids,
        train_pq,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = train_ivf_centroids(emb, k=8, iters=2)
    books = train_pq(emb, m=8, ks=8, iters=1)
    save_quantizer(spark, str(tmp_path / "q"), cents, books)
    got_c, got_b = load_quantizer(spark, str(tmp_path / "q"))
    assert got_c == cents
    assert got_b == books

    qs = query_set(emb)
    a = ann_ivf_pq_topk(emb, qs, k=5, centroids=cents, codebooks=books)
    b = ann_ivf_pq_topk(emb, qs, k=5, centroids=got_c, codebooks=got_b)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b

    # IVF-only quantizer round-trips with codebooks absent
    save_quantizer(spark, str(tmp_path / "q2"), centroids=cents)
    c2, b2 = load_quantizer(spark, str(tmp_path / "q2"))
    assert c2 == cents and b2 is None


def test_embedding_quantize_matches_numpy(spark):
    """Int8 quantization: per-label checksum and MSE equal a numpy
    recomputation of the same spec, and the error respects the scalar
    quantization bound (half-step per dimension)."""
    from rxtls_spark.queries_training import q_embedding_quantize

    got = {r["label"]: r for r in q_embedding_quantize(spark, SF_SMOKE).collect()}

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    X = np.array([[float(v) for v in r["embedding"]] for r in rows])
    labels = np.array([r["label"] for r in rows])
    lo, hi = X.min(axis=0), X.max(axis=0)
    span = hi - lo
    span_nz = np.where(span == 0, 1.0, span)
    # round-half-up like Spark/DuckDB round() for non-negative values
    c = np.floor((X - lo) / span_nz * 255 + 0.5).astype(np.int64) - 128
    c = np.where(span == 0, -128, c)
    deq = (c + 128) / 255.0 * span + lo
    mse = ((X - deq) ** 2).sum(axis=1) / 64.0
    for lab in np.unique(labels):
        m = labels == lab
        assert got[int(lab)]["n"] == int(m.sum())
        assert got[int(lab)]["code_checksum"] == int(c[m].sum())
        assert abs(got[int(lab)]["avg_mse"] - round(float(mse[m].mean()), 9)) <= 1e-9
        # half-step bound: per-dim |x - deq| <= span/255/2 (+ float slop)
        assert got[int(lab)]["avg_mse"] <= float(((span / 255 / 2) ** 2).mean()) * 1.01


def test_embedding_pca_numpy_recompute(spark):
    """q_embedding_pca == an exact numpy replica of the deterministic
    power iteration (same 6-dp mean/component rounding, same sign
    rule, same 5-dp floor-stable projection), and the found direction
    captures above-average variance."""
    import math

    from rxtls_spark.queries_training import PCA_ITERS, q_embedding_pca

    got = {
        r["vec_id"]: (r["label"], r["pc1"])
        for r in q_embedding_pca(spark, SF_SMOKE).collect()
    }

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    labels = {r["vec_id"]: r["label"] for r in rows}
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def r6(a):
        return np.floor(a * 1e6 + 0.5) / 1e6

    mu = r6(X.mean(axis=0))
    C = X - mu
    v = np.full(X.shape[1], 0.125)
    for _ in range(PCA_ITERS):
        d = C @ v
        s = d @ C
        v = r6(s / math.sqrt(float((s * s).sum())))
        if v[0] < 0:
            v = -v
    pc1 = np.floor((C @ v) * 1e5 + 0.5) / 1e5

    assert set(got) == set(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == (labels[vid], pc1[i]), vid

    # the power-iteration direction explains above-average variance
    var_along = float(((C @ v) ** 2).mean()) / float((v @ v))
    avg_dim_var = float((C ** 2).mean(axis=0).mean())
    assert var_along > avg_dim_var


def test_ann_recall_eval_full_probe_is_exact_and_plan(spark):
    """Structural correctness of the recall harness: probing ALL cells
    makes the candidate set the whole corpus, so approx == exact and
    recall is exactly 1.0 for every query.  The default-probe output
    must be bounded by it.  Plan: the only nested-loop join is the
    brute-force anchor (deliberate — it IS the exact baseline), the
    probed side rides a broadcast hash join on the cell key, and no
    Python evaluates anywhere."""
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        KMEANS_K,
        q_ann_recall_eval,
    )
    from tests.conftest import SF_SMOKE

    full = q_ann_recall_eval(spark, SF_SMOKE, n_probe=KMEANS_K)
    rows = full.collect()
    assert rows
    assert all(r["recall"] == 1.0 and r["n_hit"] == 10 for r in rows), rows

    dflt = q_ann_recall_eval(spark, SF_SMOKE)
    # plan asserts BEFORE execution: post-collect AQE plans print the
    # initial plan a second time, double-counting every node
    p = plan_string(dflt, "simple")
    assert p.count("BroadcastNestedLoopJoin") == 1, p  # the exact anchor only
    assert "BroadcastHashJoin" in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p

    by_q = {r["q_id"]: r["n_hit"] for r in dflt.collect()}
    assert set(by_q) == {r["q_id"] for r in rows}
    assert all(0 <= v <= 10 for v in by_q.values())


def test_cluster_purity_matches_python_majority_rule(spark):
    """Purity over the Spark-side cell assignment must match a pure
    Python recomputation of the (cnt DESC, label ASC) majority rule
    and the exact (n_top*1e5) DIV n_vecs purity — the novel logic here
    is the majority/purity arithmetic (the training + assignment spec
    is already locked by the kmeans tests and oracle).  Also: cells
    partition the corpus (n_vecs sums to the table count), n_top <=
    n_vecs, and purity_e5 is in [0, 100000]."""
    from collections import Counter, defaultdict

    from rxtls_spark.functions.hashing import knuth_hash
    from rxtls_spark.operators.similarity import (
        ivf_assign_expr,
        train_ivf_centroids,
    )
    from rxtls_spark.queries_training import (
        KMEANS_ITERS,
        KMEANS_K,
        q_cluster_purity,
    )
    from tests.conftest import SF_SMOKE

    got = {r["cell"]: r for r in q_cluster_purity(spark, SF_SMOKE).collect()}

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    pairs = emb.select(
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
        "label",
    ).collect()

    by_cell = defaultdict(Counter)
    for r in pairs:
        by_cell[r["cell"]][int(r["label"])] += 1
    assert set(got) == set(by_cell)
    assert sum(r["n_vecs"] for r in got.values()) == len(pairs)
    for cell, hist in by_cell.items():
        n_vecs = sum(hist.values())
        top_label = min(hist, key=lambda l: (-hist[l], l))
        r = got[cell]
        assert r["n_vecs"] == n_vecs
        assert r["top_label"] == top_label
        assert r["n_top"] == hist[top_label]
        assert r["purity_e5"] == (hist[top_label] * 100000) // n_vecs
        assert 0 <= r["purity_e5"] <= 100000
        assert r["n_top"] <= r["n_vecs"]


def test_knn_graph_matches_python_replica(spark):
    """Edges, e5-floored cosines, (cos DESC, nbr) ranks and the mutual
    flag recomputed in Python over the Spark-side cell assignment
    (the quantizer itself is proven by the kmeans tests): exact
    equality.  Also locks: rank in [1, KNN_K], no self-edges, and
    mutual edges really have their reverse edge in the output."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.functions.hashing import knuth_hash
    from rxtls_spark.operators.similarity import (
        ivf_assign_expr,
        train_ivf_centroids,
    )
    from rxtls_spark.queries_training import (
        KMEANS_ITERS,
        KMEANS_K,
        KNN_K,
        _emb,
        q_knn_graph,
    )
    from tests.conftest import SF_SMOKE

    emb = _emb(spark, SF_SMOKE)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
    ).collect()

    def cos_e5(a, b):
        # the exact sequential fold of operators/similarity._cosine_cols
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            dot += x * y
            na += x * x
            nb += y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        c = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return math.floor(c * 100000)

    by_cell = {}
    for r in asg:
        by_cell.setdefault(r["cell"], []).append(
            (r["vec_id"], r["embedding"])
        )
    want = {}
    for members in by_cell.values():
        for vid, e in members:
            cand = sorted(
                (-cos_e5(e, e2), v2)
                for v2, e2 in members
                if v2 != vid
            )[:KNN_K]
            for rk, (negc, v2) in enumerate(cand, start=1):
                want[(vid, v2)] = (rk, -negc)

    got = {
        (r["vec_id"], r["nbr_id"]): r
        for r in q_knn_graph(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for (vid, nbr), r in got.items():
        rk, c = want[(vid, nbr)]
        assert vid != nbr
        assert 1 <= r["rank"] <= KNN_K
        assert (r["rank"], r["cos_e5"]) == (rk, c), (vid, nbr)
        assert r["mutual"] == (1 if (nbr, vid) in want else 0), (vid, nbr)


def test_hard_negatives_semantics(spark):
    """Triplet-mining locks: pos shares the anchor's label, neg does
    not, margin == pos − neg, anchors are unique, and the output
    agrees with a brute-force in-cell replica built from the SAME
    trained quantizer (cells recomputed via train/assign, cosine via
    the proven list ops on driver)."""
    import math

    from rxtls_spark.functions.hashing import knuth_hash
    from rxtls_spark.operators.similarity import (
        ivf_assign_expr,
        train_ivf_centroids,
    )
    from rxtls_spark.queries_training import (
        KMEANS_ITERS,
        KMEANS_K,
        _emb,
        q_hard_negatives,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    emb = _emb(spark, SF_SMOKE)
    cents = train_ivf_centroids(
        emb, k=KMEANS_K, iters=KMEANS_ITERS, metric="l2",
        seed_order=knuth_hash(F.col("vec_id")), round_dp=6,
    )
    rows = emb.select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label"),
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias("cell"),
    ).collect()
    vecs = {r["vec_id"]: (list(r["embedding"]), r["label"], r["cell"]) for r in rows}

    def cos_e5(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(b * b for b in v))
        return math.floor(dot / (nu * nv) * 100000)

    by_cell = {}
    for vid, (e, lab, cell) in vecs.items():
        by_cell.setdefault(cell, []).append(vid)

    expect = {}
    for vid, (e, lab, cell) in vecs.items():
        pos = neg = None
        for other in by_cell[cell]:
            if other == vid:
                continue
            oe, olab, _ = vecs[other]
            key = (-cos_e5(e, oe), other)
            if olab == lab:
                pos = min(pos, key) if pos else key
            else:
                neg = min(neg, key) if neg else key
        if pos and neg:
            expect[vid] = (lab, pos[1], -pos[0], neg[1], -neg[0])

    got = {r["anchor"]: r for r in q_hard_negatives(spark, SF_SMOKE).collect()}
    assert set(got) == set(expect)
    for a, (lab, pid, pcos, nid, ncos) in expect.items():
        r = got[a]
        assert (
            r["label"], r["pos_id"], r["pos_cos_e5"],
            r["neg_id"], r["neg_cos_e5"], r["margin_e5"],
        ) == (lab, pid, pcos, nid, ncos, pcos - ncos), a
        assert vecs[r["pos_id"]][1] == lab and vecs[r["neg_id"]][1] != lab


def test_knn_components_matches_union_find(spark):
    """Connected components over the MUTUAL kNN edges recomputed with a
    driver-side union-find built from q_knn_graph's own output (the
    graph itself is locked by test_knn_graph_matches_python_replica):
    exact membership, min-id roots, and component sizes.  Also locks
    the singleton rule — vectors with no mutual edge do not appear."""
    from rxtls_spark.queries_training import (
        q_knn_components,
        q_knn_graph,
    )
    from tests.conftest import SF_SMOKE

    edges = [
        (r["vec_id"], r["nbr_id"])
        for r in q_knn_graph(spark, SF_SMOKE).collect()
        if r["mutual"] == 1
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members = {}
    for v in parent:
        members.setdefault(find(v), set()).add(v)
    # min-label roots: re-key every component by its smallest member
    want = {}
    for root, vs in members.items():
        lo = min(vs)
        for v in vs:
            want[v] = (lo, len(vs))

    got = {
        r["vec_id"]: (r["cluster_root"], r["comp_size"])
        for r in q_knn_components(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert want, "smoke data must produce at least one mutual edge"
    for v, (root, size) in got.items():
        assert root <= v and size >= 2


def test_rrf_fusion_matches_python_replica(spark):
    """Fused ranking recomputed in Python from q_bm25_topk's own
    output (already oracle-proven) plus an exact-fold cosine dense
    ranking to the top-1 hit's embedding: doc set, component ranks,
    1e6 // (K + r) scores and fused ranks all exact.  Also locks:
    ranks are 1..RRF_TOPK unique, absent-list ranks are 0, and the
    dense seed really is the lexical top-1."""
    import math

    from rxtls_spark.queries_training import (
        RRF_K,
        RRF_TOPK,
        _emb,
        q_bm25_topk,
        q_rrf_fusion,
    )
    from tests.conftest import SF_SMOKE

    lex = {
        r["doc_id"]: r["rank"]
        for r in q_bm25_topk(spark, SF_SMOKE).collect()
    }
    qid = next(d for d, rk in lex.items() if rk == 1)
    embs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in _emb(spark, SF_SMOKE).collect()
    }
    qe = embs[qid]

    def cos_e5(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        c = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return math.floor(c * 100000)

    dense_sorted = sorted(
        ((-cos_e5(e, qe), v) for v, e in embs.items())
    )[:RRF_TOPK]
    dense = {v: rk for rk, (_, v) in enumerate(dense_sorted, start=1)}

    fused = {}
    for d in set(lex) | set(dense):
        s = 0
        if d in lex:
            s += 1000000 // (RRF_K + lex[d])
        if d in dense:
            s += 1000000 // (RRF_K + dense[d])
        fused[d] = s
    order = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_TOPK]
    want = {
        d: (lex.get(d, 0), dense.get(d, 0), s, rk)
        for rk, (d, s) in enumerate(order, start=1)
    }

    got = {r["doc_id"]: r for r in q_rrf_fusion(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    for d, (rl, rd, s, rk) in want.items():
        r = got[d]
        assert (r["r_lex"], r["r_dense"], r["rrf_e6"], r["rank"]) == (
            rl,
            rd,
            s,
            rk,
        ), d
    assert sorted(r["rank"] for r in got.values()) == list(
        range(1, RRF_TOPK + 1)
    )
    assert got[qid]["r_lex"] == 1 and got[qid]["r_dense"] == 1


def test_ndcg_eval_bounds_and_full_probe_is_perfect(spark):
    """Structural NDCG locks: (1) idcg_num recomputed in Python from
    brute_force_topk's own (rank, sim_e5) output with the shared
    integer weights — exact; (2) dcg_num <= idcg_num and ndcg_e6 in
    [0, 1e6] (rearrangement bound: the ideal list maximizes the
    discounted sum); (3) probing ALL cells makes the candidate list
    the exact list, so every query scores ndcg_e6 == 1e6 — the
    recall-eval full-probe proof, graded."""
    from rxtls_spark.operators.similarity import brute_force_topk
    from rxtls_spark.queries_training import (
        ANN_EVAL_K,
        KMEANS_K,
        _emb,
        _ndcg_weights,
        q_ndcg_eval,
    )
    from rxtls_spark.operators.similarity import query_set
    from tests.conftest import SF_SMOKE

    wts = _ndcg_weights(ANN_EVAL_K)
    assert wts[0] == 1_000_000 and all(
        a > b for a, b in zip(wts, wts[1:])
    )

    emb = _emb(spark, SF_SMOKE)
    ideal = {}
    for r in brute_force_topk(emb, query_set(emb), k=ANN_EVAL_K).collect():
        ideal.setdefault(r["q_id"], 0)
        ideal[r["q_id"]] += max(r["sim_e5"], 0) * wts[r["rank"] - 1]

    got = {r["q_id"]: r for r in q_ndcg_eval(spark, SF_SMOKE).collect()}
    assert set(got) >= set(ideal) and got
    for q, r in got.items():
        assert r["idcg_num"] == ideal.get(q, 0), q
        assert 0 <= r["dcg_num"] <= r["idcg_num"], q
        assert 0 <= r["ndcg_e6"] <= 1_000_000
        if r["idcg_num"] > 0:
            assert (
                r["ndcg_e6"]
                == (r["dcg_num"] * 1_000_000) // r["idcg_num"]
            )

    full = q_ndcg_eval(spark, SF_SMOKE, n_probe=KMEANS_K).collect()
    assert full
    for r in full:
        assert r["dcg_num"] == r["idcg_num"]
        if r["idcg_num"] > 0:
            assert r["ndcg_e6"] == 1_000_000


def test_source_centroid_sim_matches_python_replica(spark):
    """Independent replica: per-source per-dim means recomputed with
    math.fsum (exact summation) then e6-floored, pairwise cosine with
    the identical index-order fold — every pair row must match
    exactly, and the matrix must cover exactly C(#sources, 2) ordered
    pairs with symmetric-free source_a < source_b."""
    import math
    from collections import defaultdict

    from rxtls_spark.queries_training import (
        PCA_DIM,
        q_source_centroid_sim,
    )
    from tests.conftest import SF_SMOKE

    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    vecs = defaultdict(list)
    for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect():
        if r["vec_id"] in src:
            vecs[src[r["vec_id"]]].append(
                [float(x) for x in r["embedding"]]
            )
    cents = {}
    for s, vs in vecs.items():
        cents[s] = (
            len(vs),
            [
                math.floor(
                    math.fsum(v[k] for v in vs) / len(vs) * 1e6 + 0.5
                )
                / 1e6
                for k in range(PCA_DIM)
            ],
        )
    expected = {}
    for sa in sorted(cents):
        for sb in sorted(cents):
            if sa >= sb:
                continue
            na, va = cents[sa]
            nb, vb = cents[sb]
            dot = aa = bb = 0.0
            for k in range(PCA_DIM):
                dot += va[k] * vb[k]
                aa += va[k] * va[k]
                bb += vb[k] * vb[k]
            cos = dot / (math.sqrt(aa) * math.sqrt(bb))
            expected[(sa, sb)] = (na, nb, int(math.floor(cos * 1e5 + 0.5)))

    got = {
        (r["source_a"], r["source_b"]): (r["n_a"], r["n_b"], r["cos_e5"])
        for r in q_source_centroid_sim(spark, SF_SMOKE).collect()
    }
    assert got == expected
    n_src = len(cents)
    assert len(got) == n_src * (n_src - 1) // 2
    assert all(-100000 <= v[2] <= 100000 for v in got.values())


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Spark DIV and
    DuckDB // semantics; Python // floors, so signed values need
    this helper (the zipf_alpha replica convention)."""
    q = a // b
    return q + 1 if q < 0 and q * b != a else q


def test_bitext_mine_matches_python_replica(spark):
    """Exact replica of the whole margin-mining chain at SF_SMOKE:
    e5-floored cosines (index-order fold), top-K neighborhood sums
    DIV K in both directions, the margin ratio and the (margin DESC,
    y_id) winner — every output row bit-identical."""
    import math

    from rxtls_spark.queries_training import (
        BITEXT_K,
        BITEXT_SRC_MOD,
        _docs,
        _emb,
        q_bitext_mine,
    )
    from tests.conftest import SF_SMOKE

    langs = {
        r["doc_id"]: r["lang"]
        for r in _docs(spark, SF_SMOKE).select("doc_id", "lang").collect()
    }
    embs = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in _emb(spark, SF_SMOKE).collect()
    }

    def cos_e5(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 100000)

    xs = sorted(
        d
        for d, lg in langs.items()
        if lg == "en" and d % BITEXT_SRC_MOD == 0 and d in embs
    )
    ys = sorted(d for d, lg in langs.items() if lg != "en" and d in embs)
    assert len(xs) >= BITEXT_K and len(ys) >= BITEXT_K

    cos = {
        (x, y): cos_e5(embs[x], embs[y]) for x in xs for y in ys
    }
    ax = {
        x: _tdiv(
            sum(
                c
                for c, _ in sorted(
                    ((cos[(x, y)], y) for y in ys),
                    key=lambda t: (-t[0], t[1]),
                )[:BITEXT_K]
            ),
            BITEXT_K,
        )
        for x in xs
    }
    ay = {
        y: _tdiv(
            sum(
                c
                for c, _ in sorted(
                    ((cos[(x, y)], x) for x in xs),
                    key=lambda t: (-t[0], t[1]),
                )[:BITEXT_K]
            ),
            BITEXT_K,
        )
        for y in ys
    }
    want = {}
    for x in xs:
        cands = []
        for y in ys:
            den = ax[x] + ay[y]
            if den > 0:
                m = _tdiv(2 * cos[(x, y)] * 1000000, den)
                cands.append((-m, y))
        if cands:
            neg_m, y = min(cands)
            want[x] = (y, langs[y], cos[(x, y)], -neg_m)

    got = {
        r["x_id"]: (r["y_id"], r["y_lang"], r["cos_e5"], r["margin_e6"])
        for r in q_bitext_mine(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) >= 10  # the smoke pool is non-trivial


def test_bitext_mine_margin_cancels_hubness(spark, tmp_path):
    """The reason margin beats raw cosine (Artetxe & Schwenk 2019):
    a hub vector that is EVERY source's nearest raw-cosine neighbor
    pays its own high neighborhood mean in the denominator, so the
    true pair wins the margin ranking.  Constructed corpus: two en
    sources, one shared hub (raw-cos argmax of both), one true pair
    each — margin must pick the true pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rxtls_spark.queries_training import q_bitext_mine

    vecs = {
        0: [1.0, 0, 0, 0, 0, 0],        # en source a  (doc_id%5==0)
        5: [0, 1.0, 0, 0, 0, 0],        # en source b  (doc_id%5==0)
        1: [0.65, 0, 0, 0.7599, 0, 0],  # true pair of 0
        6: [0, 0.65, 0, 0, 0.7599, 0],  # true pair of 5
        2: [0.9, 0.9, 0.1, 0, 0, 0],    # the hub: cos≈0.706 to BOTH
        3: [0.1, 0.1, 0, 0, 0, 0.99],   # filler
        4: [0.1, 0.1, 0.99, 0, 0, 0],   # filler
    }
    langs = {0: "en", 5: "en", 1: "fr", 6: "fr", 2: "de", 3: "es", 4: "es"}
    ids = sorted(vecs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "lang": pa.array([langs[i] for i in ids]),
                "text": pa.array(["t"] * len(ids)),
            }
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [vecs[i] for i in ids], type=pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(ids), type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )

    # premise guard: the hub IS the raw-cosine argmax for both sources
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb)

    for src in (0, 5):
        raw_best = max(
            (i for i in ids if langs[i] != "en"),
            key=lambda i: cos(vecs[src], vecs[i]),
        )
        assert raw_best == 2, "test premise: hub must win raw cosine"

    got = {
        r["x_id"]: r["y_id"]
        for r in q_bitext_mine(spark, str(tmp_path)).collect()
    }
    assert got == {0: 1, 5: 6}, got


def test_silhouette_matches_python_replica(spark):
    """Per-cell simplified silhouette recomputed in Python from the
    SAME trained centroids: (distance, cell) argmin assignment, own/
    min-other L2 distances, e5-floored s, BIGINT sums and the
    truncating mean — rows bit-identical.  Plus range/coverage
    invariants."""
    import math

    from rxtls_spark.functions.hashing import knuth_hash
    from rxtls_spark.operators.similarity import train_ivf_centroids
    from rxtls_spark.queries_training import (
        KMEANS_ITERS,
        KMEANS_K,
        _emb,
        q_silhouette,
    )
    from tests.conftest import SF_SMOKE

    import pyspark.sql.functions as F

    emb = _emb(spark, SF_SMOKE)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    vecs = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.collect()
    }

    def l2(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return math.sqrt(s)

    agg = {}
    for v, e in vecs.items():
        ds = [(l2(e, c), cell) for cell, c in cents]
        a, own = min(ds)
        b = min(d for d, cell in ds if cell != own)
        mx = max(a, b)
        s_e5 = math.floor((b - a) / mx * 100000) if mx > 0 else 0
        assert -100000 <= s_e5 <= 100000
        n, tot = agg.get(own, (0, 0))
        agg[own] = (n + 1, tot + s_e5)

    def tdiv(a, b):
        q = a // b
        return q + 1 if q < 0 and q * b != a else q

    want = {
        cell: (n, tot, tdiv(tot, n)) for cell, (n, tot) in agg.items()
    }
    got = {
        r["cell"]: (r["n_vecs"], r["sum_s_e5"], r["mean_s_e5"])
        for r in q_silhouette(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(vecs)


def test_kcenter_coreset_matches_greedy_replica(spark):
    """kcenter_coreset vs a pure-Python greedy farthest-point replica
    (the exact sequential _cosine_cols fold, e5 floor, (msim ASC,
    vec_id ASC) pick rule, (cos DESC, sel_rank ASC) assignment) over
    the smoke embeddings — picks, covers and assignment counts must
    match EXACTLY; covers must be monotone non-decreasing past the
    seed sentinel and assignment counts must sum to the corpus."""
    import math

    from rxtls_spark.queries_training import (
        KCENTER_K,
        KCENTER_SEED_COVER,
        q_kcenter_coreset,
    )
    from tests.conftest import SF_SMOKE

    rows = sorted(
        q_kcenter_coreset(spark, SF_SMOKE).collect(),
        key=lambda r: r["sel_rank"],
    )
    embs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    def cos_e5(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            dot += x * y
            na += x * x
            nb += y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        c = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return math.floor(c * 100000)

    picks = [(1, min(embs), KCENTER_SEED_COVER)]
    for t in range(2, KCENTER_K + 1):
        chosen = {p[1] for p in picks}
        best = min(
            (
                (max(cos_e5(e, embs[p[1]]) for p in picks), v)
                for v, e in embs.items()
                if v not in chosen
            )
        )
        picks.append((t, best[1], best[0]))

    counts = dict.fromkeys(range(1, KCENTER_K + 1), 0)
    for v, e in embs.items():
        best = max(
            (cos_e5(e, embs[p[1]]), -p[0]) for p in picks
        )
        counts[-best[1]] += 1

    assert len(rows) == KCENTER_K
    for r, (t, vid, cov) in zip(rows, picks):
        assert (r["sel_rank"], r["vec_id"], r["cover_e5"]) == (t, vid, cov)
        assert r["n_assigned"] == counts[t], t
    covers = [r["cover_e5"] for r in rows[1:]]
    assert covers == sorted(covers), "greedy covers must be monotone"
    assert rows[0]["cover_e5"] == KCENTER_SEED_COVER
    assert sum(r["n_assigned"] for r in rows) == len(embs)


def test_dbscan_matches_python_replica(spark):
    """Full DBSCAN recomputed driver-side over the Spark-side cell
    assignment (quantizer proven by the kmeans tests): in-cell
    ε-pairs on the exact e5-floored cosine fold, the ≥MIN_PTS core
    rule, union-find components over core–core edges, min-root border
    attachment, and core/member counts — exact row equality.  Also
    locks the noise rule (non-core, no core neighbor → absent) and
    that isolated cores appear as singleton clusters of themselves."""
    import math

    from pyspark.sql import functions as F

    from rxtls_spark.functions.hashing import knuth_hash
    from rxtls_spark.operators.similarity import (
        ivf_assign_expr,
        train_ivf_centroids,
    )
    from rxtls_spark.queries_training import (
        DBSCAN_MIN_PTS,
        DBSCAN_TAU_E5,
        KMEANS_ITERS,
        KMEANS_K,
        _emb,
        q_dbscan_clusters,
    )
    from tests.conftest import SF_SMOKE

    emb = _emb(spark, SF_SMOKE)
    cents = train_ivf_centroids(
        emb,
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        metric="l2",
        seed_order=knuth_hash(F.col("vec_id")),
        round_dp=6,
    )
    asg = emb.select(
        "vec_id",
        "embedding",
        ivf_assign_expr(cents, F.col("embedding"), metric="l2").alias(
            "cell"
        ),
    ).collect()

    def cos_e5(a, b):
        # the exact sequential fold of operators/similarity._cosine_cols
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            dot += x * y
            na += x * x
            nb += y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        c = dot / (na * nb) if na > 0 and nb > 0 else 0.0
        return math.floor(c * 100000)

    by_cell = {}
    for r in asg:
        by_cell.setdefault(r["cell"], []).append(
            (r["vec_id"], r["embedding"])
        )
    nbrs = {}
    for members in by_cell.values():
        for vid, e in members:
            for wid, f in members:
                if wid != vid and cos_e5(e, f) >= DBSCAN_TAU_E5:
                    nbrs.setdefault(vid, set()).add(wid)
    core = {v for v, ns in nbrs.items() if len(ns) >= DBSCAN_MIN_PTS}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for v in core:
        for w in nbrs[v]:
            if w in core:
                ra, rb = find(v), find(w)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # min-label roots over core components (isolated cores = self root)
    root = {}
    comps = {}
    for v in core:
        comps.setdefault(find(v), set()).add(v)
    for vs in comps.values():
        lo = min(vs)
        for v in vs:
            root[v] = lo

    want = {v: (1, root[v]) for v in core}
    for v, ns in nbrs.items():
        if v in core:
            continue
        core_roots = [root[w] for w in ns if w in core]
        if core_roots:
            want[v] = (0, min(core_roots))

    n_core = {}
    n_member = {}
    for _v, (isc, rt) in want.items():
        n_core[rt] = n_core.get(rt, 0) + isc
        n_member[rt] = n_member.get(rt, 0) + 1

    got = {
        r["vec_id"]: (
            r["is_core"],
            r["cluster_root"],
            r["n_core"],
            r["n_member"],
        )
        for r in q_dbscan_clusters(spark, SF_SMOKE).collect()
    }
    assert got == {
        v: (isc, rt, n_core[rt], n_member[rt])
        for v, (isc, rt) in want.items()
    }
    assert core and any(isc == 0 for isc, _ in want.values()), (
        "smoke data must exercise both core and border roles"
    )
    assert len(got) < len(asg), "smoke data must leave some noise"


def test_map_eval_bounds_and_full_probe_is_perfect(spark):
    """Structural MAP locks: (1) ap_e6 in [0, 1e6] and n_hit ≤ k;
    (2) the AP identity — when every retrieved item is relevant AND
    fills the list, each term is exactly 1e6 so ap_e6 == 1e6;
    (3) probing ALL cells makes the candidate list the exact list,
    so every query scores n_hit == k and ap_e6 == 1e6 (the
    recall-eval full-probe proof, order-sensitive); (4) consistency
    with ann_recall_eval — identical n_hit per query at the default
    probe."""
    from rxtls_spark.queries_training import (
        ANN_EVAL_K,
        KMEANS_K,
        q_ann_recall_eval,
        q_map_eval,
    )
    from tests.conftest import SF_SMOKE

    got = {r["q_id"]: r for r in q_map_eval(spark, SF_SMOKE).collect()}
    assert got
    rec = {
        r["q_id"]: r["n_hit"]
        for r in q_ann_recall_eval(spark, SF_SMOKE).collect()
    }
    assert {q: r["n_hit"] for q, r in got.items()} == rec
    for r in got.values():
        assert 0 <= r["n_hit"] <= ANN_EVAL_K
        assert 0 <= r["ap_e6"] <= 1_000_000
        assert r["ap_num"] <= 1_000_000 * ANN_EVAL_K
        if r["n_hit"] == 0:
            assert r["ap_e6"] == 0

    full = q_map_eval(spark, SF_SMOKE, n_probe=KMEANS_K).collect()
    assert full
    for r in full:
        assert r["n_hit"] == ANN_EVAL_K
        assert r["ap_e6"] == 1_000_000, r


def test_matryoshka_eval_bounds_and_full_prefix_is_identity(spark):
    """Structural matryoshka locks: (1) overlap/jaccard bounds and
    the jaccard identity j = o/(2k−o); (2) consistency — top1
    present in the overlap implies top1_pre_rank ≥ 1; (3) truncation
    to the FULL dim is the identity: every query overlaps k-for-k
    with top1_pre_rank == 1 and jaccard == 1e6; (4) the real prefix
    actually loses something somewhere (the eval is informative)."""
    from rxtls_spark.queries_training import (
        ANN_EVAL_K,
        KMEANS_DIM,
        MRL_DIM,
        q_matryoshka_eval,
    )
    from tests.conftest import SF_SMOKE

    assert MRL_DIM < KMEANS_DIM
    got = q_matryoshka_eval(spark, SF_SMOKE).collect()
    assert got
    for r in got:
        o = r["n_overlap"]
        assert 0 <= o <= ANN_EVAL_K
        assert r["jaccard_e6"] == (o * 1000000) // (2 * ANN_EVAL_K - o)
        assert 0 <= r["top1_pre_rank"] <= ANN_EVAL_K
    assert any(
        r["n_overlap"] < ANN_EVAL_K or r["top1_pre_rank"] != 1 for r in got
    ), "16-dim prefix lost nothing — eval uninformative"

    import rxtls_spark.queries_training as qt

    old = qt.MRL_DIM
    try:
        qt.MRL_DIM = KMEANS_DIM
        full = qt.q_matryoshka_eval(spark, SF_SMOKE).collect()
    finally:
        qt.MRL_DIM = old
    for r in full:
        assert r["n_overlap"] == ANN_EVAL_K
        assert r["jaccard_e6"] == 1_000_000
        assert r["top1_pre_rank"] == 1


def test_quantized_recall_bounds_and_retention(spark):
    """Structural quantized_recall locks: (1) overlap/jaccard bounds
    and the jaccard identity j = o/(2k−o); (2) top1 consistency —
    top1_q_rank is 0 (lost) or a valid 1..k rank; (3) int8 with 255
    levels is NEARLY lossless, so every query retains a majority of
    its exact top-k (mean retention would hide a broken dequant);
    (4) the eval is informative — quantization loses something
    somewhere (otherwise the query measures nothing)."""
    from rxtls_spark.queries_training import (
        ANN_EVAL_K,
        q_quantized_recall,
    )
    from tests.conftest import SF_SMOKE

    got = q_quantized_recall(spark, SF_SMOKE).collect()
    assert got
    for r in got:
        o = r["n_overlap"]
        assert 0 <= o <= ANN_EVAL_K
        assert r["jaccard_e6"] == (o * 1000000) // (2 * ANN_EVAL_K - o)
        assert 0 <= r["top1_q_rank"] <= ANN_EVAL_K
        assert 2 * o >= ANN_EVAL_K, "int8 dequant lost a majority — broken"
    assert any(
        r["n_overlap"] < ANN_EVAL_K or r["top1_q_rank"] != 1 for r in got
    ), "quantization lost nothing — eval uninformative"


def test_source_geomedian_matches_python_replica(spark):
    """Weiszfeld recomputed in Python (plain float sums + the identical
    6-dp floor-stable rounding after every step) from the collected
    prefix vectors: exact row equality — the rounding grid is what
    makes sum-order noise unobservable, same contract as kmeans.
    Also locks: 8 rows per source, n_vecs matches, the iterate moved
    off the mean somewhere (iteration actually ran), and the median
    stays inside the per-dim data range (a convexity consequence)."""
    from collections import defaultdict
    from math import floor, sqrt

    from rxtls_spark.queries_training import (
        GM_DIM,
        GM_ITERS,
        _docs,
        _emb,
        q_source_geomedian,
    )
    from tests.conftest import SF_SMOKE

    docs = {
        r["doc_id"]: r["source"]
        for r in _docs(spark, SF_SMOKE).select("doc_id", "source").collect()
    }
    vecs = defaultdict(list)
    for r in _emb(spark, SF_SMOKE).collect():
        s = docs.get(r["vec_id"])
        if s is not None:
            vecs[s].append([float(x) for x in r["embedding"][:GM_DIM]])

    def stable6(v):
        return floor(v * 1e6 + 0.5) / 1e6

    want = {}
    for s, xs in vecs.items():
        n = len(xs)
        mean = [stable6(sum(x[d] for x in xs) / n) for d in range(GM_DIM)]
        y = list(mean)
        for _ in range(GM_ITERS):
            sw = 0.0
            sx = [0.0] * GM_DIM
            for x in xs:
                d2 = 0.0
                for d in range(GM_DIM):
                    d2 += (x[d] - y[d]) * (x[d] - y[d])
                dist = sqrt(d2)
                if dist > 0.0:
                    w = 1.0 / dist
                    sw += w
                    for d in range(GM_DIM):
                        sx[d] += w * x[d]
            if sw > 0.0:
                y = [stable6(sx[d] / sw) for d in range(GM_DIM)]
        for d in range(GM_DIM):
            want[(s, d + 1)] = (
                n,
                floor(mean[d] * 1e6 + 0.5),
                floor(y[d] * 1e6 + 0.5),
            )

    got = {
        (r["source"], r["dim"]): (r["n_vecs"], r["mean_e6"], r["gmed_e6"])
        for r in q_source_geomedian(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) == len(vecs) * GM_DIM
    assert any(v[1] != v[2] for v in got.values()), "iteration never moved"
    for (s, dimn), (_, _, gm) in got.items():
        lo = min(x[dimn - 1] for x in vecs[s]) * 1e6 - 1
        hi = max(x[dimn - 1] for x in vecs[s]) * 1e6 + 1
        assert lo <= gm <= hi, (s, dimn)


def test_cka_alignment_matches_python_replica(spark):
    """Exact replica: e4-floored coords, ±1 sign folds, bignum
    integer centered moments n·M − S·T, then the identical left-assoc
    double Frobenius folds and final floor — bit equality with the
    query.  Properties: 0 < cka < 1 on real data (prefix is neither
    orthogonal to nor identical with the JL sketch), and the
    self-similarity identity CKA(X,X) == 1 (up to one final-ulp)."""
    import math

    from rxtls_spark.queries_training import (
        CKA_DX,
        RP_DIM,
        _rp_signs,
        q_cka_alignment,
    )
    from tests.conftest import SF_SMOKE

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    signs = _rp_signs()
    X, Y = [], []
    for r in rows:
        xe = [math.floor(float(v) * 10000.0 + 0.5) for v in r["embedding"]]
        X.append(xe[:CKA_DX])
        Y.append(
            [
                sum(s * xe[i] for i, s in enumerate(signs[k]))
                for k in range(RP_DIM)
            ]
        )

    def cka(A, B):
        n = len(A)
        da, db = len(A[0]), len(B[0])
        S = [sum(r[j] for r in A) for j in range(da)]
        T = [sum(r[k] for r in B) for k in range(db)]

        def cent(P, Q, sp, sq):
            return [
                [
                    n * sum(p[j] * q[k] for p, q in zip(P, Q))
                    - sp[j] * sq[k]
                    for k in range(len(sq))
                ]
                for j in range(len(sp))
            ]

        def frob(M):
            acc = 0.0
            for row in M:
                for v in row:
                    acc = acc + float(v) * float(v)
            return acc

        f2xy = frob(cent(A, B, S, T))
        f2xx = frob(cent(A, A, S, S))
        f2yy = frob(cent(B, B, T, T))
        if f2xx > 0 and f2yy > 0:
            return math.floor(f2xy / math.sqrt(f2xx * f2yy) * 1000000.0)
        return 0

    got = q_cka_alignment(spark, SF_SMOKE).collect()
    assert len(got) == 1
    assert got[0]["n_vecs"] == len(rows)
    want = cka(X, Y)
    assert got[0]["cka_e6"] == want
    assert 0 < want < 1000000
    assert cka(X, X) in (999999, 1000000)


def test_source_sliced_w1_matches_python_replica(spark):
    """Exact-integer replica: e4 floors, ±1 sign folds, signed
    truncating bucket DIV, e9 CDFs over the per-direction observed
    buckets, Σ|Δcdf|·gap with the last bucket excluded, mean over
    directions — pair-for-pair equality.  Locks sw1 >= 0 everywhere,
    at least one strictly positive pair (informative), and the
    metric property that a source has zero distance to itself
    (checked on the replica)."""
    import math

    from rxtls_spark.queries_training import (
        RP_DIM,
        SW1_BUCKET,
        _rp_signs,
        q_source_sliced_w1,
    )
    from tests.conftest import SF_SMOKE

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    docs = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    signs = _rp_signs()
    hist: dict = {}
    n_src: dict = {}
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    ):
        if r["vec_id"] not in docs:
            continue
        src = docs[r["vec_id"]]
        xe = [math.floor(float(v) * 10000.0 + 0.5) for v in r["embedding"]]
        n_src[src] = n_src.get(src, 0) + 1
        for k in range(RP_DIM):
            y = sum(s * xe[i] for i, s in enumerate(signs[k]))
            bk = tdiv(y, SW1_BUCKET)
            hist[(src, k, bk)] = hist.get((src, k, bk), 0) + 1

    dirs_bks = {
        k: sorted({b for (s, kk, b) in hist if kk == k})
        for k in range(RP_DIM)
    }

    def cdf(src, k):
        out, cum = [], 0
        for b in dirs_bks[k]:
            cum += hist.get((src, k, b), 0)
            out.append(cum * 10**9 // n_src[src])
        return out

    srcs = sorted(n_src)
    want = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            tot_w1 = 0
            for k in range(RP_DIM):
                ca, cb = cdf(sa, k), cdf(sb, k)
                bks = dirs_bks[k]
                for j in range(len(bks) - 1):
                    tot_w1 += abs(ca[j] - cb[j]) * (bks[j + 1] - bks[j])
            want[(sa, sb)] = tot_w1 // RP_DIM

    got = q_source_sliced_w1(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        key = (r["source_a"], r["source_b"])
        assert r["sw1_e9b"] == want[key], key
        assert r["sw1_e9b"] >= 0
        assert (r["n_a"], r["n_b"]) == (n_src[key[0]], n_src[key[1]])
    assert any(v > 0 for v in want.values())

    # metric sanity on the replica: self-distance is exactly zero
    s0 = srcs[0]
    self_w1 = sum(
        abs(a - b) * g
        for k in range(RP_DIM)
        for a, b, g in zip(
            cdf(s0, k),
            cdf(s0, k),
            [y - x for x, y in zip(dirs_bks[k], dirs_bks[k][1:])],
        )
    )
    assert self_w1 == 0


def test_lof_outliers_matches_python_replica(spark):
    """LOF recomputed in exact Python ints from the knn_graph edges
    (k-dist, reach, lrd, lof — the same truncating DIVs) — row
    equality — plus Breunig's semantics: scores concentrate near 1e3
    (a uniform-ish synthetic cloud has few strong local outliers:
    median within [700, 1500]), every score positive, and the max
    LOF point's k-dist sits above its neighborhood's typical k-dist
    (the density-ratio intuition)."""
    from rxtls_spark.queries_training import q_knn_graph, q_lof_outliers
    from tests.conftest import SF_SMOKE

    edges = {}
    for r in q_knn_graph(spark, SF_SMOKE).collect():
        edges.setdefault(r["vec_id"], []).append(
            (r["nbr_id"], 100000 - r["cos_e5"])
        )
    kdist = {v: max(d for _, d in es) for v, es in edges.items()}
    n_nbrs = {v: len(es) for v, es in edges.items()}
    lrd = {}
    for v, es in edges.items():
        sr = sum(max(kdist[o], d) for o, d in es)
        lrd[v] = n_nbrs[v] * 10**9 // max(sr, 1)
    want = {}
    for v, es in edges.items():
        sl = sum(lrd[o] for o, _ in es)
        want[v] = (
            n_nbrs[v],
            kdist[v],
            lrd[v],
            sl * 1000 // max(n_nbrs[v] * lrd[v], 1),
        )

    got = q_lof_outliers(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        assert (
            r["n_nbrs"],
            r["kdist_e5"],
            r["lrd_e9"],
            r["lof_e3"],
        ) == want[r["vec_id"]], r["vec_id"]
        assert r["lof_e3"] > 0
    scores = sorted(r["lof_e3"] for r in got)
    med = scores[len(scores) // 2]
    assert 700 <= med <= 1500, med
    top = max(got, key=lambda r: (r["lof_e3"], r["vec_id"]))
    nbr_kd = [kdist[o] for o, _ in edges[top["vec_id"]]]
    assert top["kdist_e5"] > sorted(nbr_kd)[len(nbr_kd) // 2]


def test_sql_double_literal_is_bit_exact(spark):
    """r6: _cents_lit/_book_lit build their literal trees as ONE
    F.expr SQL string (py4j-cost optimization).  The repr(x)+'D'
    double literal must recover the bit-identical IEEE double for
    adversarial values — compared against the F.lit form via the
    raw int64 bit pattern, not float equality."""
    import math
    import struct

    from pyspark.sql import functions as F

    from rxtls_spark.operators.similarity import (
        _book_lit,
        _cents_lit,
        _sql_double,
    )

    vals = [
        0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 1/3, 2/3, 1e-5, -1e-5,
        1e300, -1e300, 1e-300, 5e-324, 2.2250738585072014e-308,
        0.30000000000000004, 1.7976931348623157e308,
        math.pi, -math.pi, 0.49999999999999994, 123456789.123456789,
        6.02e23, 1.079, 0.7213,
    ]
    df = spark.range(1)
    expr_col = F.expr("array(" + ",".join(_sql_double(v) for v in vals) + ")")
    lit_col = F.array(*[F.lit(float(v)) for v in vals])
    got_e, got_l = df.select(expr_col.alias("e"), lit_col.alias("l")).first()
    bits = lambda x: struct.pack("<d", x)  # noqa: E731
    assert [bits(x) for x in got_e] == [bits(v) for v in vals]
    assert [bits(x) for x in got_l] == [bits(x) for x in got_e]

    # struct/array builders equal the per-element-lit originals
    cents = [(0, vals[:4]), (3, vals[4:8]), (7, vals[8:12])]
    old_cents = F.array(
        *[
            F.struct(
                F.lit(c).alias("cell"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("centroid"),
            )
            for c, vec in cents
        ]
    )
    a, b = df.select(
        _cents_lit(cents).alias("a"), old_cents.alias("b")
    ).first()
    assert a == b
    book = [vals[:5], vals[5:10], vals[10:15]]
    old_book = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in book])
    a, b = df.select(_book_lit(book).alias("a"), old_book.alias("b")).first()
    assert [[bits(x) for x in row] for row in a] == [
        [bits(x) for x in row] for row in b
    ]
