"""Driver-contract invariants of the query registry — pure Python,
no Spark session needed."""


# The only queries allowed to lack a DuckDB oracle: their outputs embed
# xxh3 / HLL values DuckDB cannot express (pytest-locked instead).
ROWS_ONLY = {
    "content_hashes",
    "domains_csv_lines",
    "distinct_domains_approx",
}


def test_every_query_has_an_oracle_or_a_documented_exemption():
    from __spark_entry__ import oracle_sql, queries

    q, o = set(queries()), set(oracle_sql())
    assert o - q == set(), f"orphan oracles: {o - q}"
    assert q - o == ROWS_ONLY, (
        "queries without oracles must be exactly the documented "
        f"rows-only set; got {q - o}"
    )


def test_priority_order_names_resolve():
    """Registry order is driver-coverage policy (CLAUDE.md): every name
    in the priority list must actually exist, and the registry must
    lead with it — a typo here silently demotes an unproven query."""
    from __spark_entry__ import queries
    from rxtls_spark.queries import _PRIORITY_ORDER

    names = list(queries())
    missing = [n for n in _PRIORITY_ORDER if n not in names]
    assert missing == [], f"priority entries not registered: {missing}"
    assert names[: len(_PRIORITY_ORDER)] == _PRIORITY_ORDER


def test_oracle_sql_is_static():
    """oracle_sql() must be reproducible (the driver may call it in a
    separate process): two calls return identical SQL text."""
    from __spark_entry__ import oracle_sql

    assert oracle_sql() == oracle_sql()
