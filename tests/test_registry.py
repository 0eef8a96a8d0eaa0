"""Driver-contract invariants of the query registry — pure Python,
no Spark session needed."""


# The only queries allowed to lack a DuckDB oracle: their outputs embed
# xxh3 / HLL values DuckDB cannot express (pytest-locked instead).
ROWS_ONLY = {
    "content_hashes",
    "domains_csv_lines",
    "distinct_domains_approx",
    "compression_ratio",  # zlib not SQL-expressible; pytest byte-locked
    "media_audio_features",
}


def test_every_query_has_an_oracle_or_a_documented_exemption():
    from __spark_entry__ import oracle_sql, queries

    q, o = set(queries()), set(oracle_sql())
    assert o - q == set(), f"orphan oracles: {o - q}"
    assert q - o == ROWS_ONLY, (
        "queries without oracles must be exactly the documented "
        f"rows-only set; got {q - o}"
    )


def test_registry_order_is_least_recently_driver_proven_first():
    """Registry order is driver-coverage policy (CLAUDE.md): the order
    is DERIVED from the CORRECTNESS_r*.json gate files so rotation is
    self-maintaining (r4 verdict item 1).  Assert the registry follows
    the rule: never-driver-checked queries first, then ascending by
    last driver-green round, name-tiebroken."""
    from __spark_entry__ import queries
    from rxtls_spark.queries import _driver_checked_rounds, _priority_order

    names = list(queries())
    assert names == _priority_order(names)

    checked = _driver_checked_rounds()
    rounds = [checked.get(n, -1) for n in names]
    assert rounds == sorted(rounds), "registry not sorted by last-green round"


def test_r4_displaced_queries_sort_ahead_of_r4_green_queries():
    """The queries the r4 driver prefix displaced (last green in r3)
    must sort ahead of EVERY r4-green query — the rotation policy.
    (They are no longer guaranteed inside the 50-prefix itself: each
    never-driver-checked query added since sorts ahead of them, which
    is the same policy applied to newer code.)"""
    from __spark_entry__ import queries
    from rxtls_spark.queries import _driver_checked_rounds

    names = list(queries())
    displaced = {
        "contamination", "corpus_diff", "corpus_sample", "doc_chunks",
        "lang_confusion", "lm_score", "mixture_sample", "pii_scrub",
        "quality_quantile_gate", "repetition", "sequence_pack",
        "stratified_sample", "token_stats",
    }
    missing = displaced - set(names)
    assert missing == set(), f"displaced queries not registered: {missing}"
    checked = _driver_checked_rounds()
    last_displaced = max(names.index(n) for n in displaced)
    first_r4 = min(
        names.index(n) for n in names if checked.get(n, -1) >= 4
    )
    assert last_displaced < first_r4, (
        "a r4-green query sorts ahead of a r3-displaced one"
    )


def test_oracle_sql_is_static():
    """oracle_sql() must be reproducible (the driver may call it in a
    separate process): two calls return identical SQL text."""
    from __spark_entry__ import oracle_sql

    assert oracle_sql() == oracle_sql()
