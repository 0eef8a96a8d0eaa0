"""Vectorized XXH3 must equal the scalar reference on every length
class, including all boundary lengths and randomized fuzz."""

import random

import numpy as np
import pytest

from rxtls_spark.xxh3 import xxh3_64, xxh3_64_hex
from rxtls_spark.xxh3_vec import xxh3_64_batch, xxh3_hex_batch

BOUNDARIES = [0, 1, 2, 3, 4, 8, 9, 16, 17, 32, 33, 64, 65, 96, 97, 128,
              129, 160, 240, 241, 1023, 1024, 1025, 2047, 2048, 2049, 4096]


@pytest.mark.parametrize("n", BOUNDARIES)
def test_boundary_lengths(n):
    rng = random.Random(n)
    data = bytes(rng.randrange(256) for _ in range(n))
    assert int(xxh3_64_batch([data])[0]) == xxh3_64(data)


def test_fuzz_batch_equals_scalar():
    rng = random.Random(42)
    items = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 3000)))
        for _ in range(400)
    ]
    got = xxh3_64_batch(items)
    exp = np.array([xxh3_64(b) for b in items], dtype=np.uint64)
    assert (got == exp).all()


def test_long_path_mixed_block_groups():
    """One batch mixing 0/1/2/4-block long inputs plus in-group length
    spread: exercises the grouped remainder-stripe path (common-prefix
    in-place folds + the masked gmin..gmax tail within each group) and
    the whole-group fast case, against the scalar reference."""
    rng = random.Random(7)
    lens = [241, 300, 511, 1023, 1024, 1025, 1088, 1500, 2047, 2048,
            2100, 3000, 4096, 4100]
    items = [bytes(rng.randrange(256) for _ in range(n)) for n in lens]
    got = xxh3_64_batch(items)
    exp = np.array([xxh3_64(b) for b in items], dtype=np.uint64)
    assert (got == exp).all()
    # whole-group case: every item identical block count, varied stripes
    items2 = [bytes(rng.randrange(256) for _ in range(n))
              for n in (241, 400, 700, 1000, 1023)]
    got2 = xxh3_64_batch(items2)
    exp2 = np.array([xxh3_64(b) for b in items2], dtype=np.uint64)
    assert (got2 == exp2).all()


def test_hex_batch():
    items = [b"", b"abc", b"x" * 500]
    assert xxh3_hex_batch(items) == [xxh3_64_hex(b) for b in items]


def test_empty_batch():
    assert len(xxh3_64_batch([])) == 0
