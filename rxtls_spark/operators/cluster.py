"""Duplicate-cluster resolution — connected components over near-dup
pairs, and the keep-list that falls out of it.

The dedup suite (operators/dedup.py) emits PAIRS (doc_a, doc_b); a real
training-data pipeline needs CLUSTERS: the transitive closure of the
pair graph, one canonical keeper per cluster, everything else dropped.
(The reference has no analog — its dedup is per-record first-seen, P8;
this is the corpus-level extension the 100 TB mandate needs.)

Algorithm: min-label propagation.  Every node starts labeled with its
own id; each round every node takes the min of its own label and its
neighbors' labels; fixpoint = every node holds its component's min id.
Rounds needed = graph diameter — duplicate clusters are near-cliques
(LSH emits most intra-cluster pairs), so 2-4 rounds in practice; a
``max_iter`` cap bounds adversarial chains, and convergence is detected
with a monotone invariant (labels only ever decrease, so the global
label sum strictly decreases until fixpoint — one cheap agg per round,
no change-join).

Scale shape: each round is one shuffle join on node id + one partial
agg — no driver-side graph, no collect of nodes.  The round's labels
are cut from lineage with ``localCheckpoint`` — labels feed two places
per round, so without the cut the LOGICAL plan doubles every round
(2^rounds nodes → analyzer OOM by round ~10, observed).  On a real
cluster swap ``localCheckpoint`` (executor-memory, non-resilient) for
``checkpoint`` to reliable storage so executor loss can't kill a long
run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """(doc_id, cluster_root) for every node in ``pairs``; root = the
    component's min id.  Raises if not converged by ``max_iter``."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    # labels only decrease → the decimal sum strictly decreases until
    # fixpoint (decimal: no int64 overflow at 10^12 nodes)
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.u, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # cut lineage: plan is O(1)/round
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        if cur_sum == prev_sum:
            return labels.select("doc_id", F.col("label").alias("cluster_root"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_keep_list(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_root, n_cluster, keep) — keep the min id of each
    duplicate cluster, drop the rest.  Docs not in any pair are keepers
    by definition and are not emitted (join the output back to the
    corpus with a left join + coalesce(keep, true))."""
    cc = connected_components(pairs, max_iter=max_iter)
    # NOT broadcast: #clusters scales with #nodes — equi-join on the
    # root (window-over-partition would be the same shuffle)
    sizes = cc.groupBy("cluster_root").agg(F.count(F.lit(1)).alias("n_cluster"))
    return (
        cc.join(sizes, "cluster_root")
        .select(
            "doc_id",
            "cluster_root",
            "n_cluster",
            (F.col("doc_id") == F.col("cluster_root")).alias("keep"),
        )
    )
