"""T3 retry evidence: Spark's task-level retry (spark.task.maxFailures)
replaces the reference's per-block retry/backoff loop
(/root/reference/internal/core/common.go:42-49,
scheduler.go:577-595 — ≤5 attempts, exponential backoff, failover).

A transient per-task failure (first attempt of every partition raises)
must be retried and the job must complete with FULL results — the
pull-based analog of the reference's re-queue: same data, different
attempt, exactly-once output.

Runs in a SUBPROCESS: maxFailures is a SparkContext conf and only one
context exists per driver, so this can't share the suite's session
(getOrCreate() would silently return it — and stopping it would kill
every later test)."""

import os
import subprocess
import sys

_SCRIPT = r"""
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

s = (
    SparkSession.builder.master("local[4, 3]")  # local[threads, maxFailures]
    .appName("retry-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

def flaky_double(iterator):
    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("transient failure (injected, attempt 0)")
    for pdf in iterator:
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "twice": pdf["doc_id"] * 2})

df = s.range(0, 1000).select(F.col("id").alias("doc_id"))
rows = df.repartition(4).mapInPandas(flaky_double, "doc_id long, twice long").collect()
assert len(rows) == 1000, len(rows)
assert {r["doc_id"] for r in rows} == set(range(1000))
assert all(r["twice"] == 2 * r["doc_id"] for r in rows)
print("RETRY_OK")

def always_fail(iterator):
    raise RuntimeError("permanent failure")
    yield

try:
    df.mapInPandas(always_fail, "doc_id long").collect()
    raise SystemExit("job should have failed")
except Exception as e:
    assert "permanent failure" in str(e), str(e)[:200]
print("EXHAUST_OK")
s.stop()
"""


def test_task_retry_semantics_in_isolated_session():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RETRY_OK" in out.stdout
    assert "EXHAUST_OK" in out.stdout
