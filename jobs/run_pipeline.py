"""spark-submit entry point for the flagship pipeline.

Ships to a cluster as:

  zip -r rxtls_spark.zip rxtls_spark/
  spark-submit --py-files rxtls_spark.zip jobs/run_pipeline.py \\
      --pages  <iceberg-table-or-parquet-path-or-sfdir> \\
      --output <run-dir> --buckets 256 [--fail-after N]

Rerunning the same command after a failure resumes from the checkpoint
manifest (only pending buckets are processed).  Exit code 0 only when
every bucket committed; the summary JSON (printed and written to
``<output>/summary.json``) carries the per-run metrics contract
(A1-A6 analog: inputs, routed, parse failures, domains).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="pages parquet path, or a testdata sf dir to synthesize from")
    ap.add_argument("--output", required=True, help="run directory (manifest + data)")
    ap.add_argument("--buckets", type=int, default=8,
                    help="resume granularity: deterministic url-hash buckets")
    ap.add_argument("--fail-after", type=int, default=None,
                    help="test hook: abort after N bucket commits")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.manifest import CheckpointedPipeline
    from rxtls_spark.session import get_spark

    spark = get_spark("rxtls-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if os.path.isfile(os.path.join(args.pages, "documents.parquet")):
        pages = pages_df(spark, args.pages)
    else:
        pages = spark.read.parquet(args.pages)

    cp = CheckpointedPipeline(args.output, n_buckets=args.buckets)
    pending = cp.pending_buckets()
    print(f"buckets: {args.buckets} total, {len(pending)} pending", file=sys.stderr)

    try:
        summary = cp.run(
            spark, pages, log_operators_df(spark), fail_after=args.fail_after
        )
    except RuntimeError as e:
        print(f"aborted: {e} — rerun to resume", file=sys.stderr)
        summary = cp.summary()

    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0 if summary["complete"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
