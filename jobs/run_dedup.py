"""spark-submit entry point for corpus deduplication.

Ships to a cluster as:

  zip -r rxtls_spark.zip rxtls_spark/
  spark-submit --py-files rxtls_spark.zip jobs/run_dedup.py \\
      --docs <parquet-path-or-sfdir> --output <run-dir> \\
      [--threshold 0.7] [--bucket-cap 1000]

Stages: exact md5 groups → MinHash+LSH near-dup pairs (hot buckets
capped, drops AUDITED — never silent) → connected components →
keep-list → deduped corpus written to <output>/kept/.  The summary
JSON carries every count a data engineer needs to trust the run:
inputs, exact/near pairs, clusters, kept, dropped LSH buckets.
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
    ap.add_argument("--docs", required=True,
                    help="documents parquet path, or a testdata sf dir")
    ap.add_argument("--output", required=True, help="run directory")
    ap.add_argument("--threshold", type=float, default=0.7,
                    help="Jaccard threshold for near-duplicates")
    ap.add_argument("--bucket-cap", type=int, default=1000,
                    help="max docs per LSH bucket (0 = uncapped)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from rxtls_spark.operators.cluster import dedup_keep_list
    from rxtls_spark.operators.dedup import (
        exact_dup_groups,
        lsh_dropped_buckets,
        minhash_near_dups,
        minhash_signatures,
    )
    from rxtls_spark.session import get_spark

    spark = get_spark("rxtls-dedup", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    path = args.docs
    if os.path.isdir(path) and os.path.isfile(os.path.join(path, "documents.parquet")):
        path = os.path.join(path, "documents.parquet")
    docs = spark.read.parquet(path).select("doc_id", "text")
    cap = args.bucket_cap or None

    n_docs = docs.count()
    exact = exact_dup_groups(docs)
    near = minhash_near_dups(docs, args.threshold, bucket_cap=cap).persist()
    # no silent caps: every excluded bucket is counted in the summary
    dropped = (
        lsh_dropped_buckets(minhash_signatures(docs), cap).count() if cap else 0
    )

    # pair graph: exact star pairs + LSH-verified near pairs
    exact_pairs = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .join(
            exact.select(
                F.col("text_md5").alias("h"), F.col("keep_doc_id").alias("root")
            ),
            "h",
        )
        .where(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    pairs = exact_pairs.unionByName(near.select("doc_a", "doc_b")).distinct()

    keep = dedup_keep_list(pairs)
    drops = keep.where(~F.col("keep")).select("doc_id")
    kept = docs.join(drops, "doc_id", "left_anti")
    kept.write.mode("overwrite").parquet(os.path.join(args.output, "kept"))

    summary = {
        "n_docs": n_docs,
        "n_exact_groups": exact.count(),
        "n_near_pairs": near.count(),
        "n_cluster_members": keep.count(),
        "n_dropped": drops.count(),
        "n_kept": kept.count(),
        "n_dropped_lsh_buckets": dropped,
        "threshold": args.threshold,
        "bucket_cap": args.bucket_cap,
    }
    assert summary["n_kept"] + summary["n_dropped"] == n_docs
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    near.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
