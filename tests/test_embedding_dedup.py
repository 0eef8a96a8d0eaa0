"""Embedding-dedup tests: exact pairwise vs LSH recall, injected dups."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_dup(spark):
    from rxtls_spark.operators.embedding_dedup import with_injected_embedding_dups

    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return with_injected_embedding_dups(base).cache()


def test_exact_finds_injected_copies(spark, emb_dup):
    from rxtls_spark.operators.embedding_dedup import DUP_OFFSET, embedding_dup_pairs

    pairs = {
        (r["vec_a"], r["vec_b"]): r["sim_e5"]
        for r in embedding_dup_pairs(emb_dup, 0.8).collect()
    }
    injected = [
        r["vec_id"]
        for r in emb_dup.where(
            (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < DUP_OFFSET)
        ).collect()
    ]
    assert injected
    for v in injected:
        assert pairs.get((v, v + DUP_OFFSET)) in (99999, 100000), v  # cosine 1.0


def test_lsh_catches_exact_copies(spark, emb_dup):
    """Identical vectors share every LSH bucket — the scale variant must
    find 100% of exact copies (near-misses may drop; copies cannot)."""
    from rxtls_spark.operators.embedding_dedup import (
        DUP_OFFSET,
        embedding_dup_pairs_lsh,
    )

    got = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs_lsh(emb_dup, 0.8).collect()
    }
    injected = [
        r["vec_id"]
        for r in emb_dup.where(
            (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < DUP_OFFSET)
        ).collect()
    ]
    assert all((v, v + DUP_OFFSET) in got for v in injected)


def test_lsh_subset_of_exact(spark, emb_dup):
    from rxtls_spark.operators.embedding_dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = {(r["vec_a"], r["vec_b"]) for r in embedding_dup_pairs(emb_dup, 0.8).collect()}
    lsh = {(r["vec_a"], r["vec_b"]) for r in embedding_dup_pairs_lsh(emb_dup, 0.8).collect()}
    assert lsh <= exact
