"""Spark parse UDF vs the pure-pandas reference extractor — per-url
equality of every extracted field, INCLUDING byte-identical
extracted_text (the BASELINE.json per-row invariant) and the xxh3
hashes.  This is the analog of the reference's golden CSV tests
(/root/reference/internal/certlib/models_test.go:48-135)."""

import pandas as pd
import pytest

from rxtls_spark import reference, spec
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def parsed_pdf(spark):
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.operators.parse import parse_pages

    pages = pages_df(spark, SF_SMOKE)
    return parse_pages(pages).select("url", "text", "parsed.*").toPandas()


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


def test_parse_matches_reference_extractor(parsed_pdf, docs_pdf):
    by_url = {r["url"]: r for _, r in parsed_pdf.iterrows()}
    checked_valid = checked_failed = 0
    for _, doc in docs_pdf.iterrows():
        doc_id = int(doc["doc_id"])
        text = doc["text"] if isinstance(doc["text"], str) else ""
        row = by_url[spec.url(doc_id)]
        exp = reference.extract(spec.html_bytes(doc_id, text))
        if exp is None:
            assert row["entry_type"] is None, f"doc {doc_id} should fail parse"
            checked_failed += 1
            continue
        checked_valid += 1
        for field in (
            "entry_type ts_ms issuer_cn subject_cn subject_o subject_c "
            "subject_st subject_l not_before not_after leaf_offset "
            "primary_domain normalized_cn domain_org_hash chain_hash"
        ).split():
            assert row[field] == exp[field], (doc_id, field, row[field], exp[field])
        for field in ("all_domains", "normalized_domains", "output_domains"):
            assert list(row[field]) == exp[field], (doc_id, field)
        # the byte-identity invariant: extracted_text == text, per url
        assert bytes(row["extracted_text"]) == text.encode("utf-8"), doc_id
    assert checked_valid > 400 and checked_failed > 0


def test_failure_rate_about_2pct(parsed_pdf):
    failed = parsed_pdf["entry_type"].isna().sum()
    assert 0.01 < failed / len(parsed_pdf) < 0.03


def test_precert_share(parsed_pdf):
    pre = (parsed_pdf["entry_type"] == "PrecertLogEntry").sum()
    valid = parsed_pdf["entry_type"].notna().sum()
    assert 0.10 < pre / valid < 0.18  # doc_id % 7 == 3 → ~1/7
