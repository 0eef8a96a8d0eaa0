"""Broadcast-join enrichment (SURVEY §2.3 J1-J3).

All lookup sides are tiny catalogs (21 operators / ~45 suffixes — the
analog of all_logs_list.json's 21 operators & 175 logs), so every join
here is an explicit ``broadcast()`` hash join: no shuffle of the page
stream, the 100 TB side streams map-side.  The usability filter (P1,
/root/reference/internal/certlib/api.go:235-244) is applied to the
lookup BEFORE the join, exactly like the reference filters its catalog
before building the operator map (api.go:249-262); an unmatched issuer
enriches to operator_name '' (api.go:259-262 leaves OperatedBy empty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rxtls_spark.datagen.lookups import USABLE_STATES


def enrich_operator(pages: DataFrame, log_operators: DataFrame,
                    issuer_col: str = "issuer_cn") -> DataFrame:
    """Broadcast left join issuer CN → operator_name ('' when unmatched
    or the operator's log state is rejected/retired/test)."""
    usable = log_operators.filter(F.col("state").isin(*USABLE_STATES))
    joined = pages.join(
        F.broadcast(usable.select("host_pattern", "operator_name")),
        on=pages[issuer_col] == F.col("host_pattern"),
        how="left",
    )
    return joined.drop("host_pattern").withColumn(
        "operator_name", F.coalesce(F.col("operator_name"), F.lit(""))
    )


def enrich_suffix(pages: DataFrame, tld_suffixes: DataFrame,
                  domain_col: str = "primary_domain") -> DataFrame:
    """Longest-matching public-suffix join → suffix_group ('other' when
    no suffix matches).

    Implemented as a broadcast equi-join on the *candidate suffix set*:
    each page row explodes to at most 3 candidate suffixes (last 1/2/3
    labels of the domain) via JVM-side array ops — no Python — then the
    longest match wins via a max_by aggregation over the original row
    key.  At 100 TB the explode factor ≤3 is map-local and the join
    stays broadcast; no shuffle besides the final per-url reduction,
    which AQE coalesces.

    A cheaper variant used on the hot path: because suffix tables are
    small, we instead join candidates and resolve with ``max_by`` over
    suffix length grouped by url — still one shuffle.  For the flagship
    pipeline we avoid even that: see ``suffix_group_expr`` which does
    the whole lookup as a broadcast map expression.
    """
    cands = pages.withColumn(
        "_labels", F.split(F.col(domain_col), r"\.")
    ).withColumn(
        "_cand",
        F.array_compact(
            F.array(
                F.when(F.size("_labels") >= 2, F.array_join(F.slice("_labels", -1, 1), ".")),
                F.when(F.size("_labels") >= 3, F.array_join(F.slice("_labels", -2, 2), ".")),
                F.when(F.size("_labels") >= 4, F.array_join(F.slice("_labels", -3, 3), ".")),
            )
        ),
    )
    exploded = cands.withColumn("_suffix", F.explode_outer("_cand"))
    joined = exploded.join(
        F.broadcast(tld_suffixes),
        on=exploded["_suffix"] == tld_suffixes["suffix"],
        how="left",
    )
    keys = [c for c in pages.columns]
    best = (
        joined.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(F.length("suffix").alias("l"), "suffix_group"),
                F.when(F.col("suffix").isNotNull(), F.length("suffix")),
            ).alias("_best")
        )
        .withColumn(
            "suffix_group", F.coalesce(F.col("_best.suffix_group"), F.lit("other"))
        )
        .drop("_best")
    )
    return best


def suffix_group_expr(tld_rows: list[tuple[str, str]], domain_col: str = "primary_domain"):
    """Shuffle-free longest-suffix lookup as a pure Catalyst expression.

    The suffix table is a driver-side constant (like the reference's
    in-process catalog map, api.go:249-262), so we compile it into a
    literal map and probe with the last-1/2/3-label candidates via
    ``element_at`` — zero shuffle, zero Python, fully codegen'd.
    Preferred on the flagship path; ``enrich_suffix`` is the general
    table-driven form.
    """
    pairs = []
    for s, g in tld_rows:
        pairs.append(F.lit(s))
        pairs.append(F.lit(g))
    m = F.create_map(*pairs)
    dom = F.col(domain_col)

    # last-k-labels candidate via substring_index — a plain C string scan
    # instead of regex split + array slice + array_join (measured ~8% of
    # the whole lite pipeline wall).  substring_index(d, ".", -k) == the
    # joined last k labels whenever d has >= k+1 labels, and equals d
    # itself otherwise — so "result != d" IS the old size(labels) >= k+1
    # guard (equivalence fuzzed in tests/test_route.py adversarial set).
    def cand(k: int):
        si = F.substring_index(dom, ".", -k)
        return F.when(si != dom, si)

    # try_element_at: ANSI-safe — missing key / null candidate → null
    return F.coalesce(
        F.try_element_at(m, cand(3)),
        F.try_element_at(m, cand(2)),
        F.try_element_at(m, cand(1)),
        F.lit("other"),
    )
