"""T3 retry evidence: Spark's task-level retry (spark.task.maxFailures)
replaces the reference's per-block retry/backoff loop
(/root/reference/internal/core/common.go:42-49,
scheduler.go:577-595 — ≤5 attempts, exponential backoff, failover).

A transient per-task failure (first attempt of every partition raises)
must be retried and the job must complete with FULL results — the
pull-based analog of the reference's re-queue: same data, different
attempt, exactly-once output.  Requires its own session: maxFailures=1
in the shared fixture would fail the job, and the conf is
cluster-static."""

import pandas as pd
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def retry_spark():
    s = (
        SparkSession.builder.master("local[4, 3]")  # local[threads, maxFailures]
        .appName("retry-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _flaky_double(iterator):
    """Fails on attempt 0 of every task, succeeds on retries — the
    deterministic stand-in for a transient fetch error."""
    from pyspark import TaskContext

    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("transient failure (injected, attempt 0)")
    for pdf in iterator:
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "twice": pdf["doc_id"] * 2})


def test_transient_task_failures_are_retried_exactly_once(retry_spark):
    df = retry_spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = df.repartition(4).mapInPandas(
        _flaky_double, "doc_id long, twice long"
    )
    rows = out.collect()
    # complete and exactly-once despite every task failing once
    assert len(rows) == 1000
    assert {r["doc_id"] for r in rows} == set(range(1000))
    assert all(r["twice"] == 2 * r["doc_id"] for r in rows)


def test_persistent_failure_fails_the_job(retry_spark):
    """maxFailures exhausted → job error surfaces (the reference's
    ≤5-attempts-then-fail contract, common.go:42-49)."""

    def always_fail(iterator):
        raise RuntimeError("permanent failure")
        yield  # pragma: no cover

    df = retry_spark.range(0, 10).select(F.col("id").alias("doc_id"))
    with pytest.raises(Exception, match="permanent failure"):
        df.mapInPandas(always_fail, "doc_id long").collect()
