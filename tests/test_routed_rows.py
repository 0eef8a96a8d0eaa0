"""Routed-row equality (north rule): rows read back from the written
multi-sink output must equal the reference extractor per url — field
values, route assignment, and per-sink membership, not just counts."""

import os

import pandas as pd
import pytest

from rxtls_spark import reference, spec
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def routed_dir(spark, tmp_path_factory):
    from rxtls_spark.datagen.lookups import log_operators_df
    from rxtls_spark.datagen.pages import pages_df
    from rxtls_spark.pipeline import enriched, write_routed

    out = str(tmp_path_factory.mktemp("routed"))
    df = enriched(pages_df(spark, SF_SMOKE), log_operators_df(spark))
    write_routed(df, out)
    return os.path.join(out, "routed")


def _expected_route(doc_id: int, lang: str) -> tuple[str, str]:
    """suffix_group + route from the spec formulas (independent of the
    Spark longest-suffix machinery)."""
    h = spec.host(doc_id)
    # generated hosts end in exactly one catalog suffix
    best = ""
    for s in {**spec.SUFFIX_GROUPS, **spec.EXTRA_SUFFIXES}:
        if h.endswith("." + s) or ("." + h).endswith("." + s):
            if len(s) > len(best):
                best = s
    group = {**spec.SUFFIX_GROUPS, **spec.EXTRA_SUFFIXES}.get(best, "other")
    return group, f"{lang}|{group}"


def test_routed_rows_equal_reference(spark, routed_dir):
    routed = {
        r["url"]: r for r in spark.read.parquet(routed_dir).collect()
    }
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    checked = 0
    for _, doc in docs.iterrows():
        doc_id = int(doc["doc_id"])
        text = doc["text"] if isinstance(doc["text"], str) else ""
        url = spec.url(doc_id)
        exp = reference.extract(spec.html_bytes(doc_id, text))
        if exp is None:
            assert url not in routed, f"malformed row {doc_id} was routed"
            continue
        row = routed[url]
        # field equality against the straight-line reference
        for f in ("issuer_cn", "subject_o", "primary_domain",
                  "domain_org_hash", "chain_hash", "not_before", "not_after"):
            assert row[f] == exp[f], (doc_id, f)
        # route assignment from the independent formula
        exp_group, exp_route = _expected_route(doc_id, doc["lang"])
        # wildcard/alt primaries still end in the host's suffix —
        # group must match the formula-derived group
        assert row["suffix_group"] == exp_group, (doc_id, row["suffix_group"])
        assert row["route"] == exp_route
        # operator enrichment: filtered states ('' for op 18/19/20)
        op = spec.operator_id(doc_id)
        exp_op = (
            ""
            if spec.OPERATOR_STATES.get(op) in ("rejected", "retired", "test")
            else spec.OPERATOR_NAMES[op - 1]
        )
        assert row["operator_name"] == exp_op, (doc_id, op)
        checked += 1
    assert checked > 400


def test_sink_directories_partition_correctly(spark, routed_dir):
    """Every parquet file under lang=X/suffix_group=Y contains only
    rows of that route — physical sink integrity."""
    df = spark.read.parquet(routed_dir)
    from pyspark.sql import functions as F

    bad = df.where(
        F.concat_ws("|", F.col("lang"), F.col("suffix_group")) != F.col("route")
    ).count()
    assert bad == 0
