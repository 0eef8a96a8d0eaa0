"""Multimodal plumbing tests: the codec is stubbed (no image libs in
the container) but the Spark-side schema/partitioning/UDF-batch shape
is real — decode output must match the deterministic container header,
frame sampling must match the arithmetic."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from rxtls_spark.operators.multimodal import media_df

    return media_df(spark, SF_SMOKE).cache()


def test_media_kinds(spark, media):
    counts = {r["kind"]: r["n"] for r in media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}


def test_decode_matches_header(spark, media):
    from rxtls_spark import operators
    from rxtls_spark.operators.multimodal import decode_media

    dec = {r["doc_id"]: r for r in decode_media(media).collect()}
    for doc_id in list(dec)[:50]:
        r = dec[doc_id]
        assert r["decode_ok"] == "stub"
        assert r["width"] == 16 + doc_id % 48
        assert r["height"] == 16 + doc_id % 32
        if r["kind"] == "image":
            exp = (r["width"] * r["height"] * (1 + doc_id % 3)) % 4096
        else:
            exp = 256 + doc_id % 1024
        assert r["body_bytes"] == exp, doc_id


def test_frame_sampling_arithmetic(spark, media):
    from rxtls_spark.operators.multimodal import sample_frames

    frames = sample_frames(media, every=4, frame_size=64)
    agg = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    for r in agg:
        body = 256 + r["doc_id"] % 1024
        n_full = body // 64
        assert r["n"] == (n_full + 3) // 4, r["doc_id"]


def test_malformed_payload_quarantined(spark):
    from rxtls_spark.operators.multimodal import DECODED_SCHEMA, decode_media

    bad = spark.createDataFrame(
        [(1, "image", b"NOT A CONTAINER"), (2, "image", b"")],
        "doc_id long, kind string, payload binary",
    )
    rows = decode_media(bad).collect()
    assert all(r["decode_ok"] == "malformed" for r in rows)
    assert all(r["width"] is None for r in rows)
