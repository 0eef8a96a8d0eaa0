"""Flagship pipeline: parse → enrich → route → aggregate.

Spark restatement of `rxtls domains` (SURVEY §3.1, /root/reference/
cmd/rxtls/main.go:595-712 → internal/core/domain_extractor.go):

  pages ──(salted hash exchange on url-host)──►
  parse (ONE pandas UDF: framing+fields+normalize+hash) ──►
  split valid/failed (P5) ──►
  broadcast-join operator enrichment (J1) ──►
  suffix-group route key via broadcast map expression (J3) ──►
  single-pass multi-sink write partitionBy(lang, suffix_group) (S6/S8)
  + per-route aggregates (A6) and failure counters (A1).

The whole plan after the UDF is JVM-side; the only exchange before the
write is the (optional) salted repartition, and the final aggregate's
shuffle is partial-aggregated map-side by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark.datagen.lookups import (
    log_operators_df,
    tld_suffixes_df,
    tld_suffixes_rows,
)
from rxtls_spark.datagen.pages import pages_df
from rxtls_spark.operators.enrich import enrich_operator, suffix_group_expr
from rxtls_spark.operators.parse import failed_pages, parse_pages, valid_pages
from rxtls_spark.operators.route import route_key


def parsed_flat(pages: DataFrame) -> DataFrame:
    """pages → flattened valid parsed records (url, warc_ts, lang, text,
    + all parsed struct fields).  Expand-then-filter: one UDF
    evaluation (see parse_pages_flat)."""
    from rxtls_spark.operators.parse import parse_pages_flat

    return parse_pages_flat(pages).filter(F.col("entry_type").isNotNull())


def enriched(pages: DataFrame, log_operators: DataFrame) -> DataFrame:
    """Full enrichment: parse + operator join + suffix group + route."""
    flat = parsed_flat(pages)
    with_op = enrich_operator(flat, log_operators)
    return with_op.withColumn(
        "suffix_group", suffix_group_expr(tld_suffixes_rows())
    ).withColumn("route", route_key())


def enriched_lite(
    pages: DataFrame,
    log_operators: DataFrame,
    passthrough: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Enrichment over the LITE parse variant: aggregate consumers that
    never read the arrays/hashes/text get a 5× narrower Arrow transfer
    and ~half the Python work.  Spark can't prune columns through a
    UDF — choosing the narrow UDF at plan-build time IS the projection
    pushdown.  ``passthrough`` = page columns carried alongside."""
    from rxtls_spark.operators.parse import parse_page_lite_udf

    parsed = pages.select(
        *passthrough, parse_page_lite_udf(F.col("html")).alias("p")
    ).select(*passthrough, "p.*")
    valid = parsed.filter(F.col("entry_type").isNotNull())
    with_op = enrich_operator(valid, log_operators)
    return with_op.withColumn(
        "suffix_group", suffix_group_expr(tld_suffixes_rows())
    ).withColumn("route", route_key())


def route_counts(pages: DataFrame, log_operators: DataFrame) -> DataFrame:
    """Per-sink aggregate counts (A6, domain_extractor.go:642-705)."""
    return enriched_lite(pages, log_operators).groupBy("route").agg(
        F.count("*").alias("n_pages"),
        F.sum("n_domains").alias("n_domains"),
    )


def run_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-facing flagship query."""
    pages = pages_df(spark, sf_dir)
    return route_counts(pages, log_operators_df(spark))


def write_routed(df: DataFrame, out_dir: str, files_per_sink: int = 2) -> None:
    """Single-pass multi-sink write (S6): one job, one sink directory
    per (lang, suffix_group) partition; atomic per Spark's committer
    (S8 — the reference's .tmp+rename, domain_extractor.go:780-795,
    is subsumed by the output committer).

    A salted repartition on the sink key precedes the write so each
    sink gets ``files_per_sink`` files instead of one per task —
    without it, sinks × tasks files (measured 960 → 39 at sf0.1; at
    1000 executors that's the difference between 40 files and 20k per
    job). Same wall time locally: the shuffle overlaps the parse."""
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(files_per_sink))
    coalesced = (
        df.withColumn("_s", salt)
        .repartition(F.col("lang"), F.col("suffix_group"), F.col("_s"))
        .drop("_s")
    )
    (
        coalesced.write.mode("overwrite")
        .partitionBy("lang", "suffix_group")
        .parquet(os.path.join(out_dir, "routed"))
    )
