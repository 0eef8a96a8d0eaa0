"""Vectorized parse stage — the pipeline's single Python hot spot.

One Arrow-native batched UDF turns the ``html`` binary column into the
full parsed+derived struct (framing parse F10, field extraction P7,
first-seen dedup P8, normalization F1, sort O1, hashes F2/F3 — SURVEY
§2.8), mirroring how the reference does all per-entry work in one
callback (/root/reference/internal/core/domain_extractor.go:575-714).
Everything downstream (joins, routing, aggregation, writes) stays
JVM-side in whole-stage codegen.

Doing normalize+hash inside the same UDF avoids extra JVM↔Python Arrow
round-trips — at 100 TB the Arrow serialization of intermediate columns
would dominate, so the Python boundary is crossed exactly once per row
batch.

Malformed rows yield a struct with ``entry_type`` NULL; use
``valid_pages``/``failed_pages`` to split (P5,
domain_extractor.go:649-659).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf
from pyspark.sql.pandas.types import to_arrow_type
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PARSED_SCHEMA = StructType(
    [
        StructField("entry_type", StringType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("issuer_cn", StringType(), True),
        StructField("subject_cn", StringType(), True),
        StructField("subject_o", StringType(), True),
        StructField("subject_c", StringType(), True),
        StructField("subject_st", StringType(), True),
        StructField("subject_l", StringType(), True),
        StructField("not_before", LongType(), True),
        StructField("not_after", LongType(), True),
        StructField("all_domains", ArrayType(StringType()), True),
        StructField("leaf_offset", LongType(), True),
        StructField("extracted_text", BinaryType(), True),
        StructField("normalized_domains", ArrayType(StringType()), True),
        StructField("primary_domain", StringType(), True),
        StructField("output_domains", ArrayType(StringType()), True),
        StructField("normalized_cn", StringType(), True),
        StructField("domain_org_hash", StringType(), True),
        StructField("chain_hash", StringType(), True),
    ]
)

_FIELDS = [f.name for f in PARSED_SCHEMA.fields]

# Arrow-native UDFs (pa.Array in/out): skips the pandas object-Series
# materialization of the html bytes AND the output DataFrame →
# dict_to_mgr → Arrow re-conversion — the struct children are built
# once with pa.array() at C level (A/B: −14% full, −7% lite wall).
# The arrow types are derived from the Spark schemas so the worker's
# type check is exact.  Plans unchanged: arrow_udf evaluates as the
# same single ArrowEvalPython node (tests/test_plans.py locks it).
_PA_FULL = to_arrow_type(PARSED_SCHEMA)


@arrow_udf(PARSED_SCHEMA)
def parse_page_udf(html: pa.Array) -> pa.Array:
    """Framing (numpy-vectorized header decode, rxtls_spark.parse_vec)
    + fields + normalize per row, then batch-vectorized XXH3 for the
    two content hashes (rxtls_spark.xxh3_vec — numpy over the whole
    Arrow batch; the scalar path was 150+µs/row, batch is ~5µs)."""
    from binascii import b2a_base64

    from rxtls_spark.functions.normalize import domain_views, normalize_domain
    from rxtls_spark.parse_vec import parse_batch
    from rxtls_spark.xxh3_vec import xxh3_hex_batch

    recs = parse_batch(html.to_pylist())
    n = len(recs)
    # single-pass columnar assembly: fill the 19 output columns while
    # walking recs once, instead of a 19×N transpose afterwards
    # (measured −9% on the whole UDF body)
    cols: dict[str, list] = {name: [None] * n for name in _FIELDS}
    (c_et, c_ts, c_icn, c_scn, c_so, c_sc, c_sst, c_sl, c_nb, c_na, c_ad,
     c_lo, c_xt, c_nd, c_pd, c_od, c_ncn, c_oh, c_ch) = (
        cols[f] for f in _FIELDS
    )
    chain_inputs: list[bytes] = []
    hash_rows: list[int] = []
    # org-hash inputs repeat across certs sharing a SAN set — hash the
    # distinct set once and fan results back out
    uniq: dict[bytes, int] = {}
    org_idx: list[int] = []
    for i, rec in enumerate(recs):
        if rec is None:
            continue
        # memoized per distinct SAN set (normalize.domain_views) — the
        # normalize+sort+strip chain runs once per set, not per row
        norm, prim, outd, csv = domain_views(rec["all_domains"])
        c_et[i] = rec["entry_type"]
        c_ts[i] = rec["ts_ms"]
        c_icn[i] = rec["issuer_cn"]
        c_scn[i] = rec["subject_cn"]
        c_so[i] = rec["subject_o"]
        c_sc[i] = rec["subject_c"]
        c_sst[i] = rec["subject_st"]
        c_sl[i] = rec["subject_l"]
        c_nb[i] = rec["not_before"]
        c_na[i] = rec["not_after"]
        c_ad[i] = rec["all_domains"]
        c_lo[i] = rec["leaf_offset"]
        c_xt[i] = rec["extracted_text"]
        c_nd[i] = norm
        c_pd[i] = prim
        c_od[i] = outd
        c_ncn[i] = normalize_domain(rec["subject_cn"])
        org_idx.append(
            uniq.setdefault((csv + "|" + rec["subject_o"]).encode("utf-8"), len(uniq))
        )
        chain_inputs.append(b2a_base64(rec["payload"], newline=False))
        hash_rows.append(i)
    if hash_rows:
        uniq_hashes = xxh3_hex_batch(list(uniq))
        for j, k in zip(hash_rows, org_idx):
            c_oh[j] = uniq_hashes[k]
        for j, h in zip(hash_rows, xxh3_hex_batch(chain_inputs)):
            c_ch[j] = h
    return pa.StructArray.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in _PA_FULL],
        fields=list(_PA_FULL),
    )


LITE_SCHEMA = StructType(
    [
        StructField("entry_type", StringType(), True),
        StructField("issuer_cn", StringType(), True),
        StructField("primary_domain", StringType(), True),
        StructField("n_domains", LongType(), True),
    ]
)

_LITE_FIELDS = [f.name for f in LITE_SCHEMA.fields]

_PA_LITE = to_arrow_type(LITE_SCHEMA)


@arrow_udf(LITE_SCHEMA)
def parse_page_lite_udf(html: pa.Array) -> pa.Array:
    """Projection-pushdown variant for aggregate-only consumers: same
    framing parse + normalize, but no text decode, no output arrays, no
    content hashes — 5× narrower Arrow transfer and ~half the Python
    work.  Spark cannot prune columns through a UDF, so the pushdown is
    done by choosing the UDF variant at plan-build time (pipeline.py)."""
    from rxtls_spark.functions.normalize import domain_views
    from rxtls_spark.parse_vec import parse_batch

    recs = parse_batch(html.to_pylist(), want_text=False)
    n = len(recs)
    c_et, c_icn, c_pd, c_nd = (
        [None] * n, [None] * n, [None] * n, [None] * n,
    )
    for i, rec in enumerate(recs):
        if rec is None:
            continue
        c_et[i] = rec["entry_type"]
        c_icn[i] = rec["issuer_cn"]
        c_pd[i] = domain_views(rec["all_domains"])[1]
        c_nd[i] = len(rec["all_domains"])
    return pa.StructArray.from_arrays(
        [
            pa.array(col, type=f.type)
            for col, f in zip((c_et, c_icn, c_pd, c_nd), _PA_LITE)
        ],
        fields=list(_PA_LITE),
    )


@arrow_udf(ArrayType(StringType()))
def parse_page_domains_udf(html: pa.Array) -> pa.Array:
    """Narrowest variant: framing parse + normalize, emitting ONLY the
    sorted normalized-domains array (no text decode, no hashes, no
    field columns) — for domain-set consumers (distinct counts,
    explodes).  NULL for malformed rows; explode() drops NULL/empty
    arrays, which matches the valid-rows filter exactly."""
    from rxtls_spark.functions.normalize import domain_views
    from rxtls_spark.parse_vec import parse_batch

    recs = parse_batch(html.to_pylist(), want_text=False)
    return pa.array(
        [None if r is None else domain_views(r["all_domains"])[0] for r in recs],
        type=pa.list_(pa.string()),
    )


# All UDFs are semantically deterministic, but Catalyst treats
# deterministic expressions as free to duplicate and to push predicates
# through: Filter(parsed.entry_type) + Project(parsed.*) gets planned as
# TWO ArrowEvalPython nodes — the whole parse runs twice (measured 2×
# Python cost; SPARK-17728).  asNondeterministic() is the supported
# barrier: one evaluation, predicates stay above the UDF (they filter
# its OUTPUT, so placement is semantics-preserving).
# tests/test_plans.py locks the single-node plan.
parse_page_udf = parse_page_udf.asNondeterministic()
parse_page_lite_udf = parse_page_lite_udf.asNondeterministic()
parse_page_domains_udf = parse_page_domains_udf.asNondeterministic()


def parsed_col() -> Column:
    return parse_page_udf(F.col("html")).alias("parsed")


def parse_pages(pages: DataFrame) -> DataFrame:
    """pages → (url, warc_ts, lang, text, parsed struct)."""
    return pages.select("url", "warc_ts", "lang", "text", parsed_col())


def parse_pages_flat(pages: DataFrame) -> DataFrame:
    """pages → flattened parsed records, failures included (entry_type
    NULL).

    Expands the struct in a projection directly above the UDF and
    leaves filtering to the caller: filtering on ``parsed.entry_type``
    BEFORE expanding makes Catalyst plan the UDF TWICE (one
    ArrowEvalPython feeding the Filter, a second re-evaluating for the
    expansion) — measured 2× the parse cost of the whole pipeline.
    Expand-then-filter keeps a single ArrowEvalPython
    (tests/test_plans.py asserts the node count)."""
    return pages.select("url", "warc_ts", "lang", "text", parsed_col()).select(
        "url", "warc_ts", "lang", "text", "parsed.*"
    )


def valid_pages(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("parsed.entry_type").isNotNull())


def failed_pages(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("parsed.entry_type").isNull())


def flat_parsed(parsed_valid: DataFrame) -> DataFrame:
    """Flatten the struct (P7 projection, models.go:226-279 analog)."""
    return parsed_valid.select("url", "warc_ts", "lang", "text", "parsed.*")
