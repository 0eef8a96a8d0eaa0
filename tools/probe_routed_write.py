"""Profile the routed_write scaling gap (bench_scaling r3: 0.47 at
8→32 cores vs 0.62-0.69 for the parse paths).

Hypotheses:
  A. file IO / commit serialization (parquet encode + local-disk write
     + committer rename don't scale with cores)
  B. the salted repartition shuffle
  C. dynamic-partition (partitionBy) overhead

Method: run the SAME flagship transform at a given parallelism with
different terminal stages and compare.
  noop         — format("noop"): full compute + repartition shuffle,
                 zero file IO / commit → isolates A from compute
  parquet      — the bench's exact write (salt 4, partitionBy)
  parquet_s16  — salt 16: ~4× more write tasks/files per sink
  algo2        — mapreduce.fileoutputcommitter.algorithm.version=2
  flat         — no partitionBy (route stays a column) → isolates C

Usage: python tools/probe_routed_write.py <cpus> <variant> [pages_cache]
Prints one JSON line {"cpus", "variant", "sec"}.
A wrapper loop lives in the __main__ of this file when called with
'all': runs every (cpus, variant) sequentially in subprocesses (never
two Spark sessions at once) and prints the matrix.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_CACHE = os.path.join(REPO, ".cache", "pages_sf0.1_a480_v2")


def run_one(cpus: int, variant: str, cache: str) -> float:
    from pyspark.sql import functions as F

    from rxtls_spark.datagen.lookups import log_operators_df, tld_suffixes_rows
    from rxtls_spark.operators.enrich import enrich_operator, suffix_group_expr
    from rxtls_spark.operators.parse import parse_pages_flat
    from rxtls_spark.operators.route import route_key
    from rxtls_spark.session import get_spark

    extra = {"spark.sql.files.maxPartitionBytes": "8m"}
    if variant == "algo2":
        extra["spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"] = "2"
    spark = get_spark(
        "probe_write",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(cache)
    ops = log_operators_df(spark)

    def flagship():
        flat = parse_pages_flat(pages).drop("text").filter(
            F.col("entry_type").isNotNull()
        )
        return (
            enrich_operator(flat, ops)
            .withColumn("suffix_group", suffix_group_expr(tld_suffixes_rows()))
            .withColumn("route", route_key())
            .drop(
                "all_domains",
                "normalized_domains",
                "output_domains",
                "extracted_text",
            )
        )

    # warm the UDF workers (untimed)
    flagship().groupBy("route").count().collect()

    n_salt = 16 if variant == "parquet_s16" else 4
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(n_salt))

    out = tempfile.mkdtemp(prefix=f"probe_{variant}_", dir="/tmp")
    t0 = time.perf_counter()
    try:
        df = flagship()
        if variant == "noop":
            (
                df.withColumn("_s", salt)
                .repartition(F.col("lang"), F.col("suffix_group"), F.col("_s"))
                .drop("_s")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        elif variant == "flat":
            (
                df.withColumn("_s", salt)
                .repartition(F.col("lang"), F.col("suffix_group"), F.col("_s"))
                .drop("_s")
                .write.mode("overwrite")
                .parquet(out)
            )
        else:  # parquet / parquet_s16 / algo2
            (
                df.withColumn("_s", salt)
                .repartition(F.col("lang"), F.col("suffix_group"), F.col("_s"))
                .drop("_s")
                .write.mode("overwrite")
                .partitionBy("lang", "suffix_group")
                .parquet(out)
            )
        sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return sec


def main() -> None:
    if sys.argv[1] == "all":
        cache = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_CACHE
        results = {}
        for variant in ("noop", "parquet", "algo2", "parquet_s16", "flat"):
            for cpus in (8, 32):
                out = subprocess.run(
                    [sys.executable, __file__, str(cpus), variant, cache],
                    capture_output=True,
                    text=True,
                    timeout=1800,
                )
                if out.returncode != 0:
                    print(f"{variant}@{cpus}: FAILED\n{out.stderr[-2000:]}")
                    continue
                r = json.loads(out.stdout.strip().splitlines()[-1])
                results[f"{variant}@{cpus}"] = r["sec"]
                print(json.dumps(r), flush=True)
        for v in ("noop", "parquet", "algo2", "parquet_s16", "flat"):
            lo, hi = results.get(f"{v}@8"), results.get(f"{v}@32")
            if lo and hi:
                print(f"{v}: 8c={lo:.1f}s 32c={hi:.1f}s eff={(lo / hi) / 4:.3f}")
        return
    cpus, variant = int(sys.argv[1]), sys.argv[2]
    cache = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_CACHE
    sec = run_one(cpus, variant, cache)
    print(json.dumps({"cpus": cpus, "variant": variant, "sec": round(sec, 3)}))


if __name__ == "__main__":
    main()
