"""Resume fixture (FIXTURES.md §7): inject a failure after half the
buckets commit, rerun, assert (a) the rerun processes only pending
buckets, (b) final routed counts equal a clean single run —
exactly-once despite the crash."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def inputs(spark):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.datagen.pages import pages_df

    return pages_df(spark, SF_SMOKE), log_operators_df(spark)


def _routed_counts(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    return {
        r["route"]: r["n"]
        for r in df.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_resume_after_injected_failure(spark, inputs, tmp_path):
    from rxtls_spark.manifest import CheckpointedPipeline

    pages, ops = inputs

    # clean single run — the golden result
    clean = CheckpointedPipeline(str(tmp_path / "clean"), n_buckets=4)
    s_clean = clean.run(spark, pages, ops)
    assert s_clean["complete"] and s_clean["buckets_committed"] == 4

    # interrupted run: crash after 2 of 4 buckets
    crashed = CheckpointedPipeline(str(tmp_path / "crash"), n_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        crashed.run(spark, pages, ops, fail_after=2)
    assert crashed.summary()["buckets_committed"] == 2
    assert len(crashed.pending_buckets()) == 2

    # resume: a NEW pipeline object over the same out_dir
    resumed = CheckpointedPipeline(str(tmp_path / "crash"), n_buckets=4)
    pending_before = resumed.pending_buckets()
    s = resumed.run(spark, pages, ops)
    assert s["complete"]
    # only the pending buckets were processed on resume
    recs = {r["bucket"] for r in resumed.records()}
    assert recs == {0, 1, 2, 3}
    assert set(pending_before).isdisjoint({0, 1, 2, 3} - set(pending_before) or set())

    # exactly-once: routed data equals the clean run, per route
    assert _routed_counts(spark, str(tmp_path / "crash")) == _routed_counts(
        spark, str(tmp_path / "clean")
    )
    assert s["n_input"] == s_clean["n_input"]
    assert s["n_routed"] == s_clean["n_routed"]
    assert s["n_parse_failed"] == s_clean["n_parse_failed"]


def test_manifest_lineage_matches_data(spark, inputs, tmp_path):
    from rxtls_spark.manifest import CheckpointedPipeline

    pages, ops = inputs
    cp = CheckpointedPipeline(str(tmp_path / "lin"), n_buckets=2)
    s = cp.run(spark, pages, ops)
    # per-file lineage row counts sum to the routed total
    total_from_files = sum(f["rows"] for r in cp.records() for f in r["files"])
    assert total_from_files == s["n_routed"]
    # resume-mode write amplification is observable, even after the
    # staging dir itself was cleaned up on completion
    assert s["staged_files"] > 0 and s["staged_bytes"] > 0
    assert not os.path.exists(cp.staging_dir)
    # manifest records are valid JSON with the full metrics contract
    rec = cp.records()[0]
    for key in ("bucket", "n_input", "n_routed", "n_parse_failed",
                "n_domains", "n_sinks", "files", "wall_s"):
        assert key in rec


def test_rerun_complete_is_noop(spark, inputs, tmp_path):
    from rxtls_spark.manifest import CheckpointedPipeline

    pages, ops = inputs
    cp = CheckpointedPipeline(str(tmp_path / "noop"), n_buckets=2)
    cp.run(spark, pages, ops)
    before = json.dumps(cp.records())
    cp.run(spark, pages, ops)  # nothing pending → no work, no mutation
    assert json.dumps(cp.records()) == before


def test_resume_scans_only_pending_bucket_files(spark, inputs, tmp_path):
    """The scale contract: a single-bucket job must read ONLY that
    bucket's staged files — partition pruning on bucket=<b>, not a
    full-input re-scan per bucket (at 100 TB the old shape read
    n_buckets x the table on resume)."""
    import re

    from rxtls_spark.manifest import CheckpointedPipeline

    pages, ops = inputs
    cp = CheckpointedPipeline(str(tmp_path / "prune"), n_buckets=4)
    staged = cp.staged(spark, pages)  # one-pass physical bucketing
    assert os.path.exists(cp._stage_marker())

    one = cp.staged_bucket(spark, pages, 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*bucket#\d+L? = 2", plan), plan

    # file-level proof: the pruned scan's rows equal exactly the
    # parquet-footer sum of bucket=2's files (inputFiles() can't be
    # used here — it reports the relation pre-pruning)
    import pyarrow.parquet as pq

    bucket2_files = [
        os.path.join(r, n)
        for r, _d, names in os.walk(os.path.join(str(tmp_path / "prune"),
                                                 "staging", "bucket=2"))
        for n in names if n.endswith(".parquet")
    ]
    assert bucket2_files
    footer_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in bucket2_files)
    assert one.count() == footer_rows
    assert len(staged.inputFiles()) > len(bucket2_files)

    # staged row placement is exhaustive and disjoint
    n_staged = staged.count()
    assert n_staged == pages.count()
    per_bucket = sum(
        cp.staged_bucket(spark, pages, b).count() for b in range(4)
    )
    assert per_bucket == n_staged

    # completing the run drops the staging copy
    cp.run(spark, pages, ops)
    assert not os.path.exists(os.path.join(str(tmp_path / "prune"), "staging"))


def test_staging_crash_safety(spark, inputs, tmp_path):
    """No marker → re-stage; marker with wrong n_buckets → re-stage."""
    import json as _json

    from rxtls_spark.manifest import CheckpointedPipeline

    pages, _ops = inputs
    cp = CheckpointedPipeline(str(tmp_path / "crashstage"), n_buckets=2)
    cp.staged(spark, pages)
    marker = cp._stage_marker()
    rec = _json.load(open(marker))
    assert rec["n_buckets"] == 2
    # simulate a crash that left data but a stale marker for another layout
    rec["n_buckets"] = 7
    with open(marker, "w") as f:
        _json.dump(rec, f)
    cp2 = CheckpointedPipeline(str(tmp_path / "crashstage"), n_buckets=2)
    cp2.staged(spark, pages)
    assert _json.load(open(marker))["n_buckets"] == 2
