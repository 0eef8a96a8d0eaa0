"""Checkpoint manifest + idempotent mid-run resume (SURVEY §2.9 T6).

The reference's only commit protocol is temp-file+rename per sink with
NO mid-run checkpoint — a crash reprocesses everything
(/root/reference/internal/core/domain_extractor.go:393-399,780-795).
The north rule requires better: per-partition lineage + metrics
persisted so a rerun processes only pending work, exactly-once.

Design (Spark-native, no driver-side row handling):

- The input is split into ``n_buckets`` deterministic buckets by
  ``pmod(xxhash64(url), n_buckets)`` — stable across runs and across
  cluster sizes (the bucket is a function of the DATA, not of task
  placement).  On a real cluster each bucket is a chunk of thousands
  of partitions; locally the default is 8.
- The bucketing is made PHYSICAL once per run directory: a single
  pass rewrites the input under ``staging/bucket=<b>/`` (atomic
  marker committed after), and every per-bucket job then reads with a
  partition filter that prunes to that bucket's files.  Without this,
  each bucket job re-scans the full input (the filter can't prune
  row groups on a hash of url) — n_buckets× the table per resume, 0.8
  PB read at 100 TB with the default 8.  With it, total input I/O is
  one scan for staging + one scan of the staged copy, regardless of
  how many times the run crashes and resumes.  The staging copy is
  dropped on completion.  (On an Iceberg warehouse the same layout is
  a ``bucket(n, url)`` partition transform on the source table — no
  staging copy needed; see sources/sinks.py.)
- Each bucket commits independently: routed parquet under
  ``data/bucket=<b>/`` (Spark's committer makes the directory appear
  atomically), then a manifest record ``manifest/bucket_<b>.json``
  written tmp+rename (the one reference idiom worth keeping — atomic
  on POSIX).
- The manifest record carries the bucket's lineage + metrics: input
  rows, parse failures, routed rows, domains, per-sink-file row counts
  (read back from the committed parquet footers — lineage derived from
  the durable artifact, not from in-flight counters), wall seconds.
- Resume = set difference on manifest files; a half-committed bucket
  (data written, no manifest) is rewritten idempotently — its content
  is a pure function of the input bucket (mode=overwrite).
- Metrics come from ``DataFrame.observe`` (A1/A6 accumulator analog,
  domain_extractor.go:134-165) — collected during the write job, no
  second pass over the data.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def bucket_expr(n_buckets: int, url_col: str = "url"):
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets))


class CheckpointedPipeline:
    """Run parse→enrich→route→write in resumable bucket commits."""

    def __init__(self, out_dir: str, n_buckets: int = 8):
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.manifest_dir = os.path.join(out_dir, "manifest")
        self.data_dir = os.path.join(out_dir, "data")
        self.staging_dir = os.path.join(out_dir, "staging")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------------

    def _manifest_path(self, b: int) -> str:
        return os.path.join(self.manifest_dir, f"bucket_{b}.json")

    def committed_buckets(self) -> set[int]:
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("bucket_") and name.endswith(".json"):
                out.add(int(name[len("bucket_"):-len(".json")]))
        return out

    def pending_buckets(self) -> list[int]:
        done = self.committed_buckets()
        return [b for b in range(self.n_buckets) if b not in done]

    def _commit(self, b: int, record: dict) -> None:
        path = self._manifest_path(b)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, path)  # atomic rename (S8 analog)

    def records(self) -> list[dict]:
        return [
            json.load(open(self._manifest_path(b)))
            for b in sorted(self.committed_buckets())
        ]

    # -- physical bucketing (one pass, resumable) -------------------------------

    def _stage_marker(self) -> str:
        return os.path.join(self.staging_dir, "_STAGED.json")

    def staged(self, spark: SparkSession, pages: DataFrame) -> DataFrame:
        """The input rewritten once under ``staging/bucket=<b>/``.

        Idempotent and crash-safe: the marker is committed (tmp+rename)
        only after the Spark write succeeds, so a crash mid-staging
        just re-stages with mode=overwrite.  Rows co-partition on
        (bucket, salt) so each write task emits ~1 file into one bucket
        directory instead of tasks×buckets fragments."""
        marker = self._stage_marker()
        if not self._marker_valid(marker):
            k = max(1, spark.sparkContext.defaultParallelism // self.n_buckets)
            salt = F.pmod(F.xxhash64("url", F.lit(1)), F.lit(k))
            (
                pages.withColumn("bucket", bucket_expr(self.n_buckets))
                .repartition(self.n_buckets * k, F.col("bucket"), salt)
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(self.staging_dir)
            )
            # record the staging write amplification (the resume trade:
            # one extra 1× copy of the input vs n_buckets× re-scans) so
            # summary() can surface it — no silent costs.  Persisted
            # OUTSIDE the staging dir because staging is deleted on
            # completion.
            n_files, n_bytes = 0, 0
            for root, _dirs, names in os.walk(self.staging_dir):
                for name in names:
                    if name.endswith(".parquet"):
                        n_files += 1
                        n_bytes += os.path.getsize(os.path.join(root, name))
            stats_tmp = self._staging_stats_path() + ".tmp"
            with open(stats_tmp, "w") as f:
                json.dump(
                    {"staged_files": n_files, "staged_bytes": n_bytes}, f
                )
            os.replace(stats_tmp, self._staging_stats_path())
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"n_buckets": self.n_buckets, "ts": time.time()}, f)
            os.replace(tmp, marker)
        return spark.read.parquet(self.staging_dir)

    def _staging_stats_path(self) -> str:
        return os.path.join(self.manifest_dir, "staging_stats.json")

    def _marker_valid(self, marker: str) -> bool:
        if not os.path.exists(marker):
            return False
        try:
            return json.load(open(marker))["n_buckets"] == self.n_buckets
        except (ValueError, KeyError):
            return False

    def staged_bucket(
        self, spark: SparkSession, pages: DataFrame, b: int
    ) -> DataFrame:
        """One bucket's pages — the filter is on the ``bucket``
        partition column, so the scan prunes to staging/bucket=<b>/
        (asserted by tests/test_manifest.py plan check)."""
        return self.staged(spark, pages).where(F.col("bucket") == b).drop("bucket")

    def cleanup_staging(self) -> None:
        import shutil

        shutil.rmtree(self.staging_dir, ignore_errors=True)

    # -- execution ------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        pages: DataFrame,
        log_operators: DataFrame,
        fail_after: int | None = None,
    ) -> dict:
        """Process all pending buckets; ``fail_after=k`` aborts after k
        bucket commits (test hook for the resume scenario)."""
        from rxtls_spark.pipeline import enriched

        pending = self.pending_buckets()
        processed = 0
        for b in pending:
            t0 = time.time()
            obs_in = Observation(f"in_{b}")
            obs_out = Observation(f"out_{b}")
            bucket_pages = self.staged_bucket(spark, pages, b).observe(
                obs_in, F.count(F.lit(1)).alias("n_input")
            )
            routed = enriched(bucket_pages, log_operators).observe(
                obs_out,
                F.count(F.lit(1)).alias("n_routed"),
                F.sum(F.size("all_domains")).alias("n_domains"),
                # DISTINCT aggregates are not allowed in observed
                # metrics; approx is fine for a lineage hint
                F.approx_count_distinct("route").alias("n_sinks"),
            )
            out_path = os.path.join(self.data_dir, f"bucket={b}")
            (
                routed.drop("extracted_text", "text")
                .write.mode("overwrite")
                .partitionBy("lang", "suffix_group")
                .parquet(out_path)
            )
            m_in, m_out = obs_in.get, obs_out.get
            record = {
                "bucket": b,
                "n_input": m_in["n_input"],
                "n_routed": m_out["n_routed"] or 0,
                "n_parse_failed": m_in["n_input"] - (m_out["n_routed"] or 0),
                "n_domains": m_out["n_domains"] or 0,
                "n_sinks": m_out["n_sinks"] or 0,
                "files": self._file_lineage(out_path),
                "wall_s": round(time.time() - t0, 3),
                "ts": time.time(),
            }
            self._commit(b, record)
            processed += 1
            if fail_after is not None and processed >= fail_after:
                raise RuntimeError(f"injected failure after {processed} buckets")
        if not self.pending_buckets():
            self.cleanup_staging()
        return self.summary()

    def _file_lineage(self, out_path: str) -> list[dict]:
        """Per-file row counts read from committed parquet footers."""
        import pyarrow.parquet as pq

        files = []
        for root, _dirs, names in os.walk(out_path):
            for name in sorted(names):
                if name.endswith(".parquet"):
                    p = os.path.join(root, name)
                    files.append(
                        {
                            "path": os.path.relpath(p, self.out_dir),
                            "rows": pq.ParquetFile(p).metadata.num_rows,
                        }
                    )
        return files

    def summary(self) -> dict:
        recs = self.records()
        n_input = sum(r["n_input"] for r in recs)
        n_failed = sum(r["n_parse_failed"] for r in recs)
        try:
            staging = json.load(open(self._staging_stats_path()))
        except (OSError, ValueError):
            staging = {"staged_files": 0, "staged_bytes": 0}
        return {
            # resume-mode write amplification: the staged 1× input copy
            # (an operator reading this sees the extra write I/O; with
            # an Iceberg bucket(url) layout the copy disappears)
            "staged_files": staging["staged_files"],
            "staged_bytes": staging["staged_bytes"],
            "buckets_committed": len(recs),
            "n_buckets": self.n_buckets,
            "complete": len(recs) == self.n_buckets,
            "n_input": n_input,
            "n_routed": sum(r["n_routed"] for r in recs),
            "n_parse_failed": n_failed,
            "n_domains": sum(r["n_domains"] for r in recs),
            # A5 analog (GetRetryRate, domain_extractor.go:195-200) +
            # the job failure gate (fail if ≥10%, download_manager.go:319-321)
            "failure_rate": round(n_failed / n_input, 6) if n_input else 0.0,
            "failure_gate_ok": (n_failed * 10 < n_input) if n_input else True,
        }
