"""Auxiliary benchmarks — guide §1.4 noop-sink isolation + plan capture.

NOT the driver's bench (bench.py is frozen for measurement).  This file
isolates each headline query's computation with the noop sink, captures
`.explain("formatted")` for the plans/r06/ evidence, and times the
write-stage variants that bench.py composes.  Usage:

    python bench_extra.py [--plans-only] [--runs N]

Prints one JSON line per timed query: {"name": ..., "secs": [..]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    plans_only = "--plans-only" in sys.argv
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    target = int(os.environ.get("SPARK_GRAFT_PAGES", "2400000"))

    from bench import build_pages_cache
    from rxtls_spark.datagen.lookups import log_operators_df, tld_suffixes_rows
    from rxtls_spark.operators.enrich import enrich_operator, suffix_group_expr
    from rxtls_spark.operators.parse import parse_pages_flat
    from rxtls_spark.operators.route import host_of_url, route_key
    from rxtls_spark.session import get_spark

    spark = get_spark(
        "bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    cache, n_pages = build_pages_cache(spark, sf_dir, target)
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
        )

    from rxtls_spark.operators.parse import parse_page_domains_udf
    from rxtls_spark.pipeline import enriched_lite, route_counts

    # ---- DataFrames for plan capture (same shapes bench.py times) ----
    dfs = {
        "parse_route_agg": route_counts(pages, ops),
        "parse_route_agg_full": flagship().groupBy("route").agg(
            F.count("*").alias("n"), F.sum(F.size("all_domains")).alias("d")
        ),
        "routed_write": flagship().drop(
            "all_domains", "normalized_domains", "output_domains",
            "extracted_text",
        ),
        "distinct_domains": pages.select(
            F.explode(parse_page_domains_udf(F.col("html"))).alias("d")
        ).agg(F.countDistinct("d")),
        "operator_windows": enriched_lite(
            pages, ops, passthrough=("lang", "warc_ts")
        ).groupBy("operator_name", F.window("warc_ts", "1 hour")).count(),
        "scan_agg_jvm": pages.select(host_of_url().alias("h")).groupBy("h").count(),
    }
    for name, df in dfs.items():
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    print(f"plans written to {plan_dir} (tag={tag})", file=sys.stderr)
    if plans_only:
        spark.stop()
        return

    # ---- noop-isolated timings ----
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t_full_parse_noop():
        noop(flagship().drop(
            "all_domains", "normalized_domains", "output_domains",
            "extracted_text",
        ))

    def t_routed_write_parquet():
        out = tempfile.mkdtemp(prefix="bx_routed_", dir="/tmp")
        try:
            df = flagship().drop(
                "all_domains", "normalized_domains", "output_domains",
                "extracted_text",
            )
            salt = F.pmod(F.xxhash64(F.col("url")), F.lit(4))
            (
                df.withColumn("_s", salt)
                .repartition(F.col("lang"), F.col("suffix_group"), F.col("_s"))
                .drop("_s")
                .write.mode("overwrite")
                .partitionBy("lang", "suffix_group")
                .parquet(out)
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def t_lite_noop():
        noop(enriched_lite(pages, ops, passthrough=("lang", "warc_ts")))

    def t_domains_noop():
        noop(pages.select(
            F.explode(parse_page_domains_udf(F.col("html"))).alias("d")
        ))

    benches = {
        "full_parse_noop": t_full_parse_noop,
        "routed_write_parquet": t_routed_write_parquet,
        "lite_noop": t_lite_noop,
        "domains_noop": t_domains_noop,
    }
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        keep = {s.strip() for s in subset.split(",")}
        benches = {k: v for k, v in benches.items() if k in keep}

    # warm-up the UDF workers once
    spark.sparkContext.setJobDescription("warmup")
    t_lite_noop()
    t_full_parse_noop()
    t_domains_noop()

    out = {}
    for name, fn in benches.items():
        secs = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            secs.append(round(time.perf_counter() - t0, 3))
        out[name] = secs
        print(json.dumps({"name": name, "secs": secs}), flush=True)
    print(json.dumps({"tag": tag, "pages": n_pages, "all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
