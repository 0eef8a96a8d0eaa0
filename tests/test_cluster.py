"""Connected-components / keep-list semantics: Spark min-label
propagation must equal a brute-force union-find on the same pairs."""

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical root = min id of the component
    comp = {}
    for x in parent:
        comp[x] = find(x)
    # path-compress fully: find() already returns the min? No — union by
    # min above guarantees the root IS the component min.
    return comp


def _spark_cc(spark, pairs, **kw):
    from rxtls_spark.operators.cluster import connected_components

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r["doc_id"]: r["cluster_root"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_matches_union_find_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(0, 400))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(300)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _spark_cc(spark, pairs) == _union_find(pairs)


def test_cc_chain_worst_case(spark):
    """A 30-node path graph needs ~log-to-diameter rounds — converges
    and still labels everything with the global min."""
    pairs = [(i, i + 1) for i in range(30)]
    got = _spark_cc(spark, pairs, max_iter=40)
    assert got == {i: 0 for i in range(31)}


def test_cc_raises_when_iteration_budget_too_small(spark):
    pairs = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _spark_cc(spark, pairs, max_iter=2)


def test_keep_list_invariants(spark):
    from rxtls_spark.operators.cluster import dedup_keep_list

    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = dedup_keep_list(df).collect()
    by_root = {}
    for r in rows:
        by_root.setdefault(r["cluster_root"], []).append(r)
    assert set(by_root) == {1, 10, 20}
    for root, members in by_root.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == root
        assert all(m["n_cluster"] == len(members) for m in members)
    assert {m["doc_id"] for m in by_root[20]} == {20, 21, 22}


def test_cc_on_lsh_pairs_matches_union_find(spark):
    """Composition: minhash LSH pairs → clusters == union-find over the
    exact same pair set (whatever LSH found, CC must close over it)."""
    from rxtls_spark.operators.dedup import minhash_near_dups, with_injected_dups

    docs = with_injected_dups(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    )
    pairs_df = minhash_near_dups(docs, 0.7).select("doc_a", "doc_b").persist()
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    from rxtls_spark.operators.cluster import connected_components

    got = {
        r["doc_id"]: r["cluster_root"]
        for r in connected_components(pairs_df).collect()
    }
    assert got == _union_find(pairs)
    # every injected exact pair lands in ONE cluster whose root is a
    # base id ≤ b (organic near-dup pairs may merge injected clusters
    # with earlier docs, so equality with b itself is not guaranteed)
    base_ids = {a for a, b in pairs if b == a + 1_000_000_000}
    for b in base_ids:
        assert got[b + 1_000_000_000] == got[b] <= b
    pairs_df.unpersist()


def test_pagerank_matches_exact_integer_replica(spark):
    """The whole damped iteration is BIGINT (e9 ranks, DIV
    contributions, exact integer sums), so a pure-Python replica must
    match EXACTLY — no tolerance.  Also: rank mass stays <= 1e9 (DIV
    truncation + dangling nodes only ever lose mass), every node gets
    a row, indeg/outdeg match the generated graph, and the plan has no
    cartesian."""
    from collections import Counter

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import PR_ITERS, PR_OUTDEG, q_pagerank
    from tests.conftest import SF_SMOKE

    df = q_pagerank(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert set(rows) == set(ids)
    n = len(ids)
    edges = []
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                edges.append((s, d))
    od = Counter(s for s, _ in edges)
    ind = Counter(d for _, d in edges)
    r = {i: 1_000_000_000 // n for i in ids}
    base = 15_000_000_000 // (100 * n)
    for _ in range(PR_ITERS):
        inc = Counter()
        for s, d in edges:
            inc[d] += r[s] // od[s]
        r = {i: base + (85 * inc[i]) // 100 for i in ids}

    for i in ids:
        got = rows[i]
        assert got["r_e9"] == r[i], i
        assert got["outdeg"] == od[i], i
        assert got["indeg"] == ind[i], i
    assert sum(v["r_e9"] for v in rows.values()) <= 1_000_000_000
    assert max(r.values()) > min(r.values()), "graph must differentiate"


def test_hits_matches_exact_integer_replica(spark):
    """HITS over the same link graph: every half-step is an exact
    BIGINT sum and the L1 normalization is (raw * 1e9) DIV total, so a
    pure-Python replica must match EXACTLY — no tolerance.  Also:
    score mass stays <= 1e9 per vector (truncation only loses), every
    node gets a row, and nodes without in-links (out-links) score
    authority (hub) 0."""
    from collections import Counter

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import HITS_ITERS, PR_OUTDEG, q_hits
    from tests.conftest import SF_SMOKE

    df = q_hits(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert set(rows) == set(ids)
    n = len(ids)
    edges = []
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                edges.append((s, d))

    h = {i: 1_000_000_000 // n for i in ids}
    a = {}
    for _ in range(HITS_ITERS):
        araw = Counter()
        for s, d in edges:
            if s in h:
                araw[d] += h[s]
        tot = sum(araw.values())
        a = {i: (v * 1_000_000_000) // tot for i, v in araw.items()}
        hraw = Counter()
        for s, d in edges:
            if d in a:
                hraw[s] += a[d]
        tot = sum(hraw.values())
        h = {i: (v * 1_000_000_000) // tot for i, v in hraw.items()}

    ind = Counter(d for _, d in edges)
    od = Counter(s for s, _ in edges)
    assert sum(a.values()) <= 1_000_000_000
    assert sum(h.values()) <= 1_000_000_000
    for i in ids:
        got = rows[i]
        assert got["auth_e9"] == a.get(i, 0), i
        assert got["hub_e9"] == h.get(i, 0), i
        if ind[i] == 0:
            assert got["auth_e9"] == 0, i
        if od[i] == 0:
            assert got["hub_e9"] == 0, i


def test_label_propagation_matches_exact_integer_replica(spark):
    """LPA is pure BIGINT (labels, counts, the (cnt DESC, lbl) rule),
    so a Python replica over the same deterministic undirected
    multi-edge graph must match EXACTLY.  Also: every node gets a row,
    comm_size sums to N, labels are real node ids, and the plan has
    no cartesian."""
    from collections import Counter

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import (
        LPA_ITERS,
        PR_OUTDEG,
        q_label_propagation,
    )
    from tests.conftest import SF_SMOKE

    df = q_label_propagation(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert set(rows) == set(ids)
    n = len(ids)
    idset = set(ids)
    und = []
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                und.append((s, d))
                und.append((d, s))
    lbl = {i: i for i in ids}
    for _ in range(LPA_ITERS):
        cnt = Counter()
        for s, d in und:
            if s in idset:  # label source must be a real node
                cnt[(d, lbl[s])] += 1
        best = {}
        for (node, lb), c in cnt.items():
            if node not in idset:
                continue
            cur = best.get(node)
            if cur is None or (c, -lb) > (cur[0], -cur[1]):
                best[node] = (c, lb)
        lbl = {i: best[i][1] if i in best else lbl[i] for i in ids}
    sizes = Counter(lbl.values())
    for i in ids:
        r = rows[i]
        assert r["label"] == lbl[i], i
        assert r["comm_size"] == sizes[lbl[i]], i
    assert sum(r["comm_size"] for r in rows.values()) == sum(
        sizes[lbl[i]] for i in ids
    )
    assert set(lbl.values()) <= idset
    # propagation actually merges communities: fewer labels than nodes
    assert len(sizes) < n


def test_triangle_count_matches_exact_replica(spark):
    """Triangle counts via a brute-force Python enumeration over the
    SAME generated graph (distinct undirected pairs, a < b): every
    node's degree, triangle count and all-BIGINT lcc_e5 must match
    EXACTLY — the degree-orientation trick is an algorithmic
    optimization, not a semantics change.  Also: no cartesian in the
    plan, Σ n_tri == 3 · |triangles|, and lcc_e5 ∈ [0, 1e5]."""
    from itertools import combinations

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import PR_OUTDEG, q_triangle_count
    from tests.conftest import SF_SMOKE

    df = q_triangle_count(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    assert set(rows) == set(ids)
    n = len(ids)
    und = set()
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                und.add((min(s, d), max(s, d)))
    adj = {i: set() for i in ids}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    n_tri = dict.fromkeys(ids, 0)
    total_tri = 0
    for v in ids:
        for x, y in combinations(sorted(adj[v]), 2):
            if (x, y) in und:
                n_tri[v] += 1
        total_tri += n_tri[v]
    assert total_tri % 3 == 0
    assert total_tri > 0, "smoke graph must contain triangles"

    for i in ids:
        got = rows[i]
        deg = len(adj[i])
        assert got["degree"] == deg, i
        assert got["n_tri"] == n_tri[i], i
        want_lcc = (
            (2 * n_tri[i] * 100000) // (deg * (deg - 1)) if deg >= 2 else 0
        )
        assert got["lcc_e5"] == want_lcc, i
        assert 0 <= got["lcc_e5"] <= 100000
    assert sum(r["n_tri"] for r in rows.values()) == total_tri


def test_link_predict_matches_exact_replica(spark):
    """Link-prediction scores via a brute-force Python enumeration over
    the SAME generated simple graph: every candidate (distance-2
    non-edge) pair's common-neighbor count, Jaccard e5 and integer
    Adamic-Adar must match EXACTLY; no existing edge may appear; no
    cartesian in the plan."""
    import math
    from itertools import combinations

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import PR_OUTDEG, q_link_predict
    from tests.conftest import SF_SMOKE

    df = q_link_predict(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {(r["a"], r["b"]): r for r in df.collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    und = set()
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                und.add((min(s, d), max(s, d)))
    adj = {i: set() for i in ids}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for z in ids:
        w = 1000000 // math.floor(math.log(len(adj[z])) * 1000.0)
        for v1, v2 in combinations(sorted(adj[z]), 2):
            if (v1, v2) in und:
                continue
            cn, aa = want.get((v1, v2), (0, 0))
            want[(v1, v2)] = (cn + 1, aa + w)
    assert want, "smoke graph must contain distance-2 non-edges"
    assert set(rows) == set(want)
    for (a, b), (cn, aa) in want.items():
        got = rows[(a, b)]
        assert (a, b) not in und
        assert got["cn"] == cn, (a, b)
        assert got["aa_e3"] == aa, (a, b)
        assert got["deg_a"] == len(adj[a]) and got["deg_b"] == len(adj[b])
        assert got["jac_e5"] == (cn * 100000) // (
            len(adj[a]) + len(adj[b]) - cn
        ), (a, b)
        assert 0 < got["jac_e5"] <= 100000


def test_khop_reach_matches_exact_replica(spark):
    """2-hop reach via brute-force BFS over the SAME generated simple
    graph: reach1 == degree, reach2 == |dist<=2 set| and the BIGINT
    expansion ratio must match EXACTLY; reach2 >= reach1 always, and
    some node must genuinely expand (reach2 > reach1)."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.plans.checks import plan_string
    from rxtls_spark.queries_training import PR_OUTDEG, q_khop_reach
    from tests.conftest import SF_SMOKE

    df = q_khop_reach(spark, SF_SMOKE)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    adj = {i: set() for i in ids}
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                adj[s].add(d)
                adj[d].add(s)
    assert set(rows) == set(ids)
    expanded = 0
    for v in ids:
        r2 = set(adj[v])
        for m in adj[v]:
            r2 |= adj[m]
        r2.discard(v)
        got = rows[v]
        assert got["reach1"] == len(adj[v]), v
        assert got["reach2"] == len(r2), v
        want_exp = (
            (len(r2) * 1000) // len(adj[v]) if adj[v] else 0
        )
        assert got["expansion_e3"] == want_exp, v
        assert got["reach2"] >= got["reach1"]
        if got["reach2"] > got["reach1"]:
            expanded += 1
    assert expanded > 0

def test_kcore_matches_exact_peel_replica(spark):
    """Synchronous k-core peel recomputed in Python over the SAME
    generated simple graph: per node deg0, removed_round, in_core and
    core_deg must match EXACTLY; both branches (peeled nodes AND
    survivors) must fire at the smoke SF, and every survivor passed
    the final round's >= KCORE_K check against the PRE-final survivor
    set (the bounded-peel invariant — the fully-converged core_deg >=
    K bound only holds at convergence, which a fixed round count
    deliberately does not promise)."""
    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        KCORE_K,
        KCORE_PEELS,
        PR_OUTDEG,
        q_kcore,
    )
    from tests.conftest import SF_SMOKE

    rows = {r["doc_id"]: r for r in q_kcore(spark, SF_SMOKE).collect()}

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    adj = {i: set() for i in ids}
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                adj[s].add(d)
                adj[d].add(s)
    alive = set(ids)
    removed_round = {}
    prev_alive = alive
    for t in range(1, KCORE_PEELS + 1):
        deg = {v: sum(1 for u in adj[v] if u in alive) for v in alive}
        rm = {v for v in alive if deg[v] < KCORE_K}
        for v in rm:
            removed_round[v] = t
        prev_alive = alive
        alive = alive - rm
    assert set(rows) == set(ids)
    assert removed_round and alive  # both branches fire
    for v in ids:
        got = rows[v]
        assert got["deg0"] == len(adj[v]), v
        assert got["removed_round"] == removed_round.get(v, 0), v
        assert got["in_core"] == (0 if v in removed_round else 1), v
        want_core = (
            sum(1 for u in adj[v] if u in alive) if v in alive else 0
        )
        assert got["core_deg"] == want_core, v
        if got["in_core"]:
            # the final-round admission check: degree against the
            # PRE-final survivor set was >= K
            assert sum(1 for u in adj[v] if u in prev_alive) >= KCORE_K, v


def test_graph_modularity_matches_exact_replica(spark):
    """Modularity recomputed in Python (exact ints + IEEE doubles in
    the identical op order) over the same undirected multigraph and
    the LPA replica's labels: exact row equality including dq_e9.
    Also locks the partition identities Σ n_nodes == N,
    Σ deg_sum == m2 == Σ in_deg over a label-closed graph... (in_deg
    only counts intra-community rows, so Σ in_deg ≤ m2), Q = Σ dq in
    (−1, 1), and that Q ≈ 0 on this random graph (the null)."""
    from collections import Counter
    from math import floor

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        LPA_ITERS,
        PR_OUTDEG,
        q_graph_modularity,
    )
    from tests.conftest import SF_SMOKE

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    idset = set(ids)
    und = []
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                und.append((s, d))
                und.append((d, s))
    lbl = {i: i for i in ids}
    for _ in range(LPA_ITERS):
        cnt = Counter()
        for s, d in und:
            cnt[(d, lbl[s])] += 1
        best = {}
        for (node, lb), c in cnt.items():
            if node not in idset:
                continue
            cur = best.get(node)
            if cur is None or (c, -lb) > (cur[0], -cur[1]):
                best[node] = (c, lb)
        lbl = {i: best[i][1] if i in best else lbl[i] for i in ids}

    m2 = len(und)
    deg = Counter(s for s, _ in und)
    in_deg = Counter()
    for s, d in und:
        if lbl[s] == lbl[d]:
            in_deg[lbl[s]] += 1
    n_nodes = Counter(lbl.values())
    deg_sum = Counter()
    for i in ids:
        deg_sum[lbl[i]] += deg[i]
    want = {
        c: (
            n_nodes[c],
            deg_sum[c],
            in_deg[c],
            floor(
                (in_deg[c] / m2 - (deg_sum[c] / m2) * (deg_sum[c] / m2))
                * 1000000000.0
            ),
        )
        for c in n_nodes
    }

    got = {
        r["label"]: (r["n_nodes"], r["deg_sum"], r["in_deg"], r["dq_e9"])
        for r in q_graph_modularity(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == n
    assert sum(v[1] for v in got.values()) == m2
    assert sum(v[2] for v in got.values()) <= m2
    q = sum(v[3] for v in got.values()) / 1e9
    assert -1.0 < q < 1.0
    # the knuth graph IS a configuration-model-like random graph, so
    # the LPA partition's Q must sit near 0 — THAT is the
    # discriminative claim (real modular structure would push Q ≫ 0,
    # and a broken in_deg/deg_sum pairing pushes it toward −1)
    assert abs(q) < 0.05, q


def test_degree_assortativity_matches_exact_replica(spark):
    """Assortativity recomputed in exact Python ints (+ IEEE doubles
    in identical op order) over the same undirected multigraph: exact
    equality.  Also locks: the symmetric-marginal identity the
    sqrt-free form depends on (Σx == Σy, Σx² == Σy² over the
    two-direction edge table), m2 == |u|, and r ≈ 0 on this random
    graph."""
    from collections import Counter
    from math import floor

    from rxtls_spark.functions.hashing import KNUTH_A, KNUTH_P
    from rxtls_spark.queries_training import (
        PR_OUTDEG,
        q_degree_assortativity,
    )
    from tests.conftest import SF_SMOKE

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    und = []
    for s in ids:
        for j in range(PR_OUTDEG):
            d = (((s * PR_OUTDEG + j) % KNUTH_P) * KNUTH_A) % KNUTH_P % n
            if d != s:
                und.append((s, d))
                und.append((d, s))
    deg = Counter(s for s, _ in und)
    m2 = len(und)
    sx = sum(deg[s] for s, _ in und)
    sy = sum(deg[d] for _, d in und)
    sxy = sum(deg[s] * deg[d] for s, d in und)
    sx2 = sum(deg[s] ** 2 for s, _ in und)
    sy2 = sum(deg[d] ** 2 for _, d in und)
    assert sx == sy and sx2 == sy2  # the symmetry the form relies on
    den = float(m2) * float(sx2) - float(sx) * float(sx)
    r_e6 = (
        floor(
            (float(m2) * float(sxy) - float(sx) * float(sx)) / den
            * 1000000.0
        )
        if den != 0.0
        else 0
    )

    rows = q_degree_assortativity(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["m2"],
        r["sum_deg"],
        r["sum_xy"],
        r["sum_x2"],
        r["r_e6"],
    ) == (m2, sx, sxy, sx2, r_e6)
    assert abs(r["r_e6"]) < 100000  # |r| < 0.1 on the random graph
