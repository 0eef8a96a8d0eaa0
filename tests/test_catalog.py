"""Catalog source tests: V3/V2 dual-schema load must agree, URL
cleaning, usability filter, semi/anti selection, filename sanitizer."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    from rxtls_spark.sources.catalog import write_log_list_fixture

    d = tmp_path_factory.mktemp("loglist")
    p3, p2 = str(d / "v3.json"), str(d / "v2.json")
    write_log_list_fixture(p3, version=3)
    write_log_list_fixture(p2, version=2)
    return p3, p2


def test_v3_and_v2_agree(spark, fixtures):
    from rxtls_spark.sources.catalog import load_log_list

    p3, p2 = fixtures
    a = {
        (r["url"], r["operator_name"], r["state"], r["tree_size"])
        for r in load_log_list(spark, p3).collect()
    }
    b = {
        (r["url"], r["operator_name"], r["state"], r["tree_size"])
        for r in load_log_list(spark, p2).collect()
    }
    assert a == b
    assert len(a) == 175


def test_url_cleaning(spark, fixtures):
    from rxtls_spark.sources.catalog import load_log_list

    cat = load_log_list(spark, fixtures[0])
    urls = [r["url"] for r in cat.collect()]
    assert all(not u.startswith("http") for u in urls)
    assert all(not u.endswith("/") for u in urls)


def test_usability_filter(spark, fixtures):
    from rxtls_spark.sources.catalog import load_log_list, usable_logs

    cat = load_log_list(spark, fixtures[0])
    ok = usable_logs(cat)
    states = {r["state"] for r in ok.select("state").distinct().collect()}
    assert states.isdisjoint({"rejected", "retired", "test"})
    assert ok.where(F.col("tree_size") <= 0).count() == 0
    assert 0 < ok.count() < cat.count()


def test_semi_anti_selection(spark, fixtures):
    from rxtls_spark.sources.catalog import (
        load_log_list,
        select_logs,
        unknown_requests,
    )

    cat = load_log_list(spark, fixtures[0])
    some = [r["url"] for r in cat.limit(3).collect()]
    req = spark.createDataFrame(
        [(f"https://{some[0]}/",), (some[1],), ("not-a-real-log.example",)],
        "url string",
    )
    sel = select_logs(cat, req)
    assert sel.count() == 2  # scheme/slash-cleaned match
    unk = unknown_requests(cat, req)
    assert [r["url"] for r in unk.collect()] == ["not-a-real-log.example"]


def test_sanitize_filename(spark):
    from rxtls_spark.sources.catalog import sanitize_filename

    df = spark.createDataFrame(
        [('ct.example.com/2025:a*b?"c"<d>|e\\f',), ("x" * 150,)], "name string"
    )
    got = [r["s"] for r in df.select(sanitize_filename(F.col("name")).alias("s")).collect()]
    assert got[0] == "ct.example.com_2025_a_b__c__d__e_f"
    assert len(got[1]) == 100


def test_domains_csv_line_matches_reference(spark):
    """Byte-identity of the CSV composition (golden set §5.2): the
    Catalyst format_string must equal the pure-python reference line."""
    from rxtls_spark import reference, spec
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.functions.csvfmt import domains_csv_line
    from rxtls_spark.operators.parse import parse_pages, valid_pages
    from tests.conftest import SF_SMOKE

    pages = pages_df(spark, SF_SMOKE).limit(200)
    flat = valid_pages(parse_pages(pages)).select("url", "text", "parsed.*")
    got = {
        r["url"]: r["line"]
        for r in flat.select("url", domains_csv_line().alias("line")).collect()
    }
    import pandas as pd

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    checked = 0
    for _, doc in docs.iterrows():
        doc_id = int(doc["doc_id"])
        u = spec.url(doc_id)
        if u not in got:
            continue
        rec = reference.extract(spec.html_bytes(doc_id, doc["text"] or ""))
        if rec is None:
            continue
        exp = reference.to_domains_csv_line(rec, doc_id).rstrip("\n")
        assert got[u] == exp, doc_id
        checked += 1
    assert checked > 50
