"""Compaction-planner invariants (operators/compact.py): greedy
in-order bin packing per sink key, files never split, groups overshoot
by at most one file."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

TARGET = 4096


def test_compaction_plan_invariants(spark):
    from rxtls_spark.queries_relational import q_sink_compaction

    rows = q_sink_compaction(spark, SF_SMOKE).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["sink_key"], []).append(r)
    assert len(by_key) == 5
    for key, files in by_key.items():
        files.sort(key=lambda r: r["hour_epoch"])
        # group ids are non-decreasing in pack order and start at 0
        grps = [f["grp"] for f in files]
        assert grps[0] == 0
        assert all(a <= b for a, b in zip(grps, grps[1:]))
        # exact floor rule: grp == cumulative_bytes_before // target
        cum = 0
        for f in files:
            assert f["grp"] == cum // TARGET
            cum += f["bytes"]
        # per-group aggregates + "overshoot by at most one file":
        # a group minus its last member always fits under target
        groups = {}
        for f in files:
            groups.setdefault(f["grp"], []).append(f)
        for members in groups.values():
            total = sum(m["bytes"] for m in members)
            assert total == members[0]["grp_bytes"]
            assert len(members) == members[0]["grp_files"]
            assert total - members[-1]["bytes"] < TARGET


def test_compaction_plan_merges_small_files(spark):
    """The planner must actually reduce file counts on the sf0.001
    inventory (many sub-KB hour files per sink)."""
    from rxtls_spark.operators.compact import compaction_plan, file_inventory

    inv = file_inventory(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    )
    n_files = inv.count()
    plan = compaction_plan(inv, target_bytes=TARGET)
    n_groups = plan.select("sink_key", "grp").distinct().count()
    assert n_groups < n_files / 2


def test_corpus_sample_is_bottom_k_by_hash(spark):
    """The sample equals a full-scan recomputation of the k lowest
    hashes — i.e. it is partitioning-independent by construction."""
    from rxtls_spark.queries_training import q_corpus_sample

    got = {r["doc_id"] for r in q_corpus_sample(spark, SF_SMOKE).collect()}
    all_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    exp = set(
        sorted(all_ids, key=lambda d: ((d * 2654435761) % 1000000007, d))[:100]
    )
    assert got == exp


def test_stratified_sample_quota_and_determinism(spark):
    """Exactly k per language, membership equals a full-scan
    recomputation of the per-lang bottom-k by hash."""
    from rxtls_spark.queries_training import q_stratified_sample

    rows = q_stratified_sample(spark, SF_SMOKE).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["rk"], r["doc_id"]))
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    full = {}
    for d in docs:
        h = ((d["doc_id"] % 1000000007) * 2654435761) % 1000000007
        full.setdefault(d["lang"], []).append((h, d["doc_id"]))
    for lang, got in by_lang.items():
        got.sort()
        assert len(got) == 20
        assert [rk for rk, _ in got] == list(range(1, 21))
        exp = [doc for _, doc in sorted(full[lang])[:20]]
        assert [doc for _, doc in got] == exp, lang
