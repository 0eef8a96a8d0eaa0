"""Driver-facing query registry + DuckDB oracle SQL.

Every entry here is an operator from SURVEY.md §2 expressed as a
(spark, sf_dir) → DataFrame callable, with an equivalent ANSI-SQL
string DuckDB runs on the same parquet views.  The pages pipeline
queries synthesise `pages` from `documents` (rxtls_spark.datagen) and
their oracles recompute expected values **directly from documents via
the pure doc_id formulas** (rxtls_spark.spec) — the oracle never sees
the binary, so a hash-match proves the whole
encode→parse→normalize→enrich→route chain.

Column-name discipline: every computed column is aliased identically
on both sides (driver hashes values after sorting columns by name).
Counts are BIGINT on both sides (DuckDB integer SUM is HUGEINT →
always CAST).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rxtls_spark import spec
from rxtls_spark.datagen.lookups import log_operators_df
from rxtls_spark.datagen.pages import pages_df
from rxtls_spark.operators.parse import failed_pages, parse_pages
from rxtls_spark.pipeline import enriched, parsed_flat, route_counts

# ---------------------------------------------------------------------------
# Oracle SQL building blocks — generated from spec constants
# ---------------------------------------------------------------------------


def _case(expr: str, mapping: list[tuple[object, str]], else_: str) -> str:
    whens = " ".join(f"WHEN {k} THEN '{v}'" for k, v in mapping)
    return f"CASE {expr} {whens} ELSE {else_} END"


def _suffix_case() -> str:
    return _case(
        "(host_idx % 10)",
        [(i, s) for i, s in enumerate(spec.SUFFIXES)],
        "'com'",
    )


def _suffix_group_case() -> str:
    return _case(
        "suffix",
        [(f"'{s}'", g) for s, g in spec.SUFFIX_GROUPS.items()],
        "'other'",
    )


def _operator_name_case() -> str:
    filtered = {
        op for op, st in spec.OPERATOR_STATES.items()
        if st in ("rejected", "retired", "test")
    }
    inner = _case(
        "op_id",
        [(i + 1, spec.OPERATOR_NAMES[i].replace("'", "''")) for i in range(21)],
        "''",
    )
    ids = ",".join(str(i) for i in sorted(filtered))
    return f"CASE WHEN op_id IN ({ids}) THEN '' ELSE {inner} END"


def pages_cte() -> str:
    """Shared WITH-clause: documents → derived page fields, pure SQL."""
    return f"""
WITH base AS (
  SELECT doc_id, text, lang,
         CASE WHEN doc_id % 100 < 15 THEN 0
              WHEN doc_id % 100 < 25 THEN 1
              WHEN doc_id % 100 < 32 THEN 2
              ELSE 3 + doc_id % {spec.N_TAIL_HOSTS} END AS host_idx,
         doc_id % 21 + 1 AS op_id,
         doc_id % 5 AS n_sans,
         (doc_id % 50 = 13) AS malformed,
         {spec.WARC_EPOCH} + (doc_id * {spec.WARC_STEP}) % {spec.WARC_SPAN} AS warc_epoch
  FROM documents
), hosts AS (
  SELECT *, {_suffix_case()} AS suffix FROM base
), pages AS (
  SELECT *,
    'site' || host_idx || '.' || suffix AS host,
    {_suffix_group_case()} AS suffix_group,
    {_operator_name_case()} AS operator_name,
    1700000000 + (doc_id % 1000) * 86400 AS nb_epoch,
    CASE WHEN doc_id % 23 = 0 AND doc_id % 5 > 1 THEN 1 ELSE 0 END AS dup_san,
    (doc_id % 11 = 0) AS wildcard_cn
  FROM hosts
), pd AS (
  SELECT *,
    CASE WHEN wildcard_cn THEN '*.' || host
         WHEN n_sans > 0 THEN 'alt0.' || host
         ELSE host END AS primary_domain,
    list_prepend(
      CASE WHEN wildcard_cn THEN '*.' || host ELSE host END,
      -- exact per-row SAN list: when dup_san=1 spec.sans sets out[1]=out[0],
      -- so the row has NO alt1 (first-seen dedup collapses the repeat)
      list_filter(
        list_transform(generate_series(1, n_sans), j -> 'alt' || (j - 1) || '.' || host),
        x -> NOT (dup_san = 1 AND x = 'alt1.' || host)
      )
    ) AS normalized_domains
  FROM pages
)
"""


# ---------------------------------------------------------------------------
# Query implementations (Spark side)
# ---------------------------------------------------------------------------


def _q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route_counts(pages_df(spark, sf_dir), log_operators_df(spark)).select(
        "route",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_domains").cast("long").alias("n_domains"),
    )


def _q_parse_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_pages(pages_df(spark, sf_dir))
    return failed_pages(parsed).agg(F.count("*").cast("long").alias("n_failed"))


def _q_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = parsed_flat(pages_df(spark, sf_dir))
    ident = F.decode(F.col("extracted_text"), "UTF-8") == F.col("text")
    return flat.agg(
        F.count("*").cast("long").alias("n_valid"),
        F.sum(F.when(ident, 1).otherwise(0)).cast("long").alias("n_identical"),
    )


def _q_parsed_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-row field extraction (P7) — the widest oracle check."""
    flat = parsed_flat(pages_df(spark, sf_dir))
    return flat.select(
        "url",
        F.col("entry_type"),
        F.col("issuer_cn"),
        F.col("subject_o"),
        F.col("subject_c"),
        F.col("not_before"),
        F.col("not_after"),
        F.col("leaf_offset"),
        F.col("primary_domain"),
        F.size("all_domains").cast("long").alias("n_all_domains"),
        F.size("normalized_domains").cast("long").alias("n_normalized"),
    )


def _q_operator_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lite-path enrichment: the aggregate reads only operator_name."""
    from rxtls_spark.pipeline import enriched_lite

    df = enriched_lite(pages_df(spark, sf_dir), log_operators_df(spark))
    return df.groupBy("operator_name").agg(
        F.count("*").cast("long").alias("n_pages")
    )


def _q_operator_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rxtls_spark.pipeline import enriched_lite

    df = enriched_lite(
        pages_df(spark, sf_dir),
        log_operators_df(spark),
        passthrough=("lang", "warc_ts"),
    )
    w = F.window("warc_ts", "1 hour")
    return (
        df.groupBy("operator_name", w.alias("w"))
        .agg(F.count("*").cast("long").alias("n_pages"))
        .select(
            "operator_name",
            F.unix_timestamp("w.start").cast("long").alias("hour_start"),
            "n_pages",
        )
    )


def _domains_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One domain per row via the narrow domains-only UDF — explode()
    drops the NULL arrays of malformed rows, so no separate filter (and
    no full-width parse) is needed."""
    from rxtls_spark.operators.parse import parse_page_domains_udf

    pages = pages_df(spark, sf_dir)
    return pages.select(
        F.explode(parse_page_domains_udf(F.col("html"))).alias("domain")
    )


def _q_distinct_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _domains_exploded(spark, sf_dir).agg(
        F.countDistinct("domain").cast("long").alias("n_distinct")
    )


def _q_distinct_domains_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct + exact verification pair (SURVEY §2.4) —
    rows-only check (approx value is algorithm-specific)."""
    doms = _domains_exploded(spark, sf_dir)
    return doms.agg(
        F.countDistinct("domain").cast("long").alias("n_exact"),
        F.approx_count_distinct("domain", 0.02).cast("long").alias("n_approx"),
    ).withColumn(
        "within_5pct",
        (F.abs(F.col("n_approx") - F.col("n_exact")) / F.col("n_exact")) < 0.05,
    )


def _q_primary_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lite-UDF projection pushdown: the aggregate only reads
    primary_domain, so the narrow parse variant suffices."""
    from rxtls_spark.operators.parse import parse_page_lite_udf

    pages = pages_df(spark, sf_dir)
    parsed = pages.select(parse_page_lite_udf(F.col("html")).alias("p")).select(
        "p.*"
    )
    return (
        parsed.filter(F.col("entry_type").isNotNull())
        .groupBy("primary_domain")
        .agg(F.count("*").cast("long").alias("n_pages"))
    )


def _q_hot_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew visibility: pages per host (the 3 hot hosts carry ~32%)."""
    from rxtls_spark.operators.route import host_of_url

    pages = pages_df(spark, sf_dir)
    return (
        pages.select(host_of_url().alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_pages"))
    )


def _q_validity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = parsed_flat(pages_df(spark, sf_dir))
    return flat.agg(
        F.min("not_before").cast("long").alias("min_nb"),
        F.max("not_after").cast("long").alias("max_na"),
        F.avg(F.col("not_after") - F.col("not_before")).alias("avg_validity_s"),
    )


def _q_sql_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship aggregate through the SQL API surface — the
    declarative front end users get via spark.sql over registered
    views (the engine is DataFrame/SQL-equivalent by construction)."""
    from rxtls_spark.pipeline import enriched

    enriched(pages_df(spark, sf_dir), log_operators_df(spark)).createOrReplaceTempView(
        "routed_pages"
    )
    return spark.sql(
        """
        SELECT route,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(size(all_domains)) AS BIGINT) AS n_domains
        FROM routed_pages
        GROUP BY route
        """
    )


_LOG_LIST_V3 = "/root/repo/fixtures/log_list_v3.json"


def _q_catalog_usable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 source parity: dual-schema JSON load + P1/P4 filters +
    per-operator counts, oracle-checked via DuckDB read_json on the
    same committed fixture."""
    from rxtls_spark.sources.catalog import load_log_list, usable_logs

    cat = usable_logs(load_log_list(spark, _LOG_LIST_V3))
    return cat.groupBy("operator_name").agg(
        F.count(F.lit(1)).alias("n_logs"),
        F.sum("tree_size").alias("total_tree_size"),
    )


def _q_csv_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 byte-identical domains CSV lines — rows-only (DuckDB lacks
    xxh3 for the embedded hash); per-line equality vs the reference
    composition is locked by tests/test_catalog.py."""
    from rxtls_spark.functions.csvfmt import domains_csv_line
    from rxtls_spark.pipeline import parsed_flat

    flat = parsed_flat(pages_df(spark, sf_dir))
    return flat.select("url", domains_csv_line().alias("csv_line"))


def _q_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxh3 content hashes — no SQL oracle (DuckDB lacks XXH3): the
    driver records a rows-only check; pytest locks goldens instead."""
    flat = parsed_flat(pages_df(spark, sf_dir))
    return flat.select("url", "domain_org_hash", "chain_hash")


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Driver-gate sampling is prefix-biased (the driver checks the first 50
# registered queries), so registry ORDER is coverage policy: the least
# recently driver-proven queries go first.  The order is DERIVED at
# registry build time from the CORRECTNESS_r*.json files the driver
# leaves at the repo root — a query never seen by any driver round
# sorts first, then ascending by the last round in which the driver
# recorded a green row for it (hash-green, or the documented rows-only
# check for the no-oracle set).  This makes rotation self-maintaining:
# once round N's gate file lands, round N+1's registry automatically
# leads with the queries round N displaced (r4 verdict item 1).


def _driver_checked_rounds() -> dict[str, int]:
    """name → latest driver round with a green row for that query.

    A row counts as green if the driver's compare passed (hash_match)
    or it is the documented rows-only check (err == 'no_oracle' with a
    row count recorded).  Errored/mismatched rows do NOT count — a
    failing query keeps sorting to the front until proven."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                latest[name] = max(latest.get(name, rnd), rnd)
    return latest


def _priority_order(names: list[str]) -> list[str]:
    checked = _driver_checked_rounds()
    return sorted(names, key=lambda n: (checked.get(n, -1), n))


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rxtls_spark.queries_relational import QUERIES_REL
    from rxtls_spark.queries_training import QUERIES_TRAIN

    merged = {**QUERIES_PIPELINE, **QUERIES_REL, **QUERIES_TRAIN}
    return {k: merged[k] for k in _priority_order(list(merged))}


QUERIES_PIPELINE: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "route_counts": _q_route_counts,
    "parse_failures": _q_parse_failures,
    "text_identity": _q_text_identity,
    "parsed_fields": _q_parsed_fields,
    "operator_counts": _q_operator_counts,
    "operator_windows": _q_operator_windows,
    "distinct_domains": _q_distinct_domains,
    "distinct_domains_approx": _q_distinct_domains_approx,
    "primary_domain_counts": _q_primary_domain_counts,
    "hot_hosts": _q_hot_hosts,
    "validity_windows": _q_validity_windows,
    "content_hashes": _q_hashes,
    "catalog_usable": _q_catalog_usable,
    "domains_csv_lines": _q_csv_lines,
    "sql_route_counts": _q_sql_route_counts,
}


def oracle_sql() -> dict[str, str]:
    from rxtls_spark.queries_relational import ORACLES_REL
    from rxtls_spark.queries_training import oracle_sql_training

    return {
        **_oracle_sql_pipeline(),
        **ORACLES_REL,
        **oracle_sql_training(),
    }


def _oracle_sql_pipeline() -> dict[str, str]:
    cte = pages_cte()
    return {
        "route_counts": cte + """
SELECT lang || '|' || suffix_group AS route,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(1 + n_sans - dup_san) AS BIGINT) AS n_domains
FROM pd WHERE NOT malformed
GROUP BY 1
""",
        "parse_failures": cte + """
SELECT CAST(count(*) AS BIGINT) AS n_failed FROM pd WHERE malformed
""",
        "text_identity": cte + """
SELECT CAST(count(*) AS BIGINT) AS n_valid,
       CAST(count(*) AS BIGINT) AS n_identical
FROM pd WHERE NOT malformed
""",
        "parsed_fields": cte + """
SELECT 'https://' || host || '/p/' || doc_id AS url,
       CASE WHEN doc_id % 7 = 3 THEN 'PrecertLogEntry' ELSE 'X509LogEntry' END AS entry_type,
       'ca' || op_id || '.example-ca.' ||
         (CASE (op_id % 3) WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) AS issuer_cn,
       'Org ' || op_id AS subject_o,
       CASE (doc_id % 8) WHEN 0 THEN 'US' WHEN 1 THEN 'DE' WHEN 2 THEN 'GB'
            WHEN 3 THEN 'FR' WHEN 4 THEN 'JP' WHEN 5 THEN 'NL'
            WHEN 6 THEN 'ES' ELSE 'CN' END AS subject_c,
       nb_epoch AS not_before,
       nb_epoch + 7776000 AS not_after,
       doc_id AS leaf_offset,
       primary_domain,
       CAST(1 + n_sans - dup_san AS BIGINT) AS n_all_domains,
       CAST(1 + n_sans - dup_san AS BIGINT) AS n_normalized
FROM pd WHERE NOT malformed
""",
        "operator_counts": cte + """
SELECT operator_name, CAST(count(*) AS BIGINT) AS n_pages
FROM pd WHERE NOT malformed
GROUP BY 1
""",
        "operator_windows": cte + """
SELECT operator_name,
       CAST(warc_epoch // 3600 * 3600 AS BIGINT) AS hour_start,
       CAST(count(*) AS BIGINT) AS n_pages
FROM pd WHERE NOT malformed
GROUP BY 1, 2
""",
        "distinct_domains": cte + """
SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_distinct
FROM (SELECT unnest(normalized_domains) AS d FROM pd WHERE NOT malformed)
""",
        "primary_domain_counts": cte + """
SELECT primary_domain, CAST(count(*) AS BIGINT) AS n_pages
FROM pd WHERE NOT malformed
GROUP BY 1
""",
        "hot_hosts": cte + """
SELECT host, CAST(count(*) AS BIGINT) AS n_pages
FROM pd
GROUP BY 1
""",
        "validity_windows": cte + """
SELECT CAST(min(nb_epoch) AS BIGINT) AS min_nb,
       CAST(max(nb_epoch + 7776000) AS BIGINT) AS max_na,
       avg(7776000.0) AS avg_validity_s
FROM pd WHERE NOT malformed
""",
        "sql_route_counts": cte + """
SELECT lang || '|' || suffix_group AS route,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(1 + n_sans - dup_san) AS BIGINT) AS n_domains
FROM pd WHERE NOT malformed
GROUP BY 1
""",
        "catalog_usable": f"""
WITH ops AS (
  SELECT unnest(operators) AS op FROM read_json('{_LOG_LIST_V3}')
), logs AS (
  SELECT op.name AS operator_name, unnest(op.logs) AS log FROM ops
), flat AS (
  SELECT operator_name, log.state AS state, log.tree_size AS tree_size FROM logs
)
SELECT operator_name, CAST(count(*) AS BIGINT) AS n_logs,
       CAST(sum(tree_size) AS BIGINT) AS total_tree_size
FROM flat
WHERE state NOT IN ('rejected', 'retired', 'test') AND tree_size > 0
GROUP BY 1
""",
        # content_hashes / distinct_domains_approx / domains_csv_lines:
        # intentionally no oracle (xxh3 not expressible in DuckDB) →
        # rows-only; exact semantics locked by pytest goldens.
    }
