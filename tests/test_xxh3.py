"""XXH3-64 implementation tests.

External anchor: the canonical empty-input vector.  All other digests
are frozen goldens (FIXTURES.md §5.3 protocol: goldens generated at
implementation time and locked) covering every length class of the
algorithm (0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / >240 incl.
multi-block >1024)."""

import json
import pathlib

import pytest

from rxtls_spark.functions.hashing import chain_hash_from_payload, domain_org_hash
from rxtls_spark.xxh3 import xxh3_64, xxh3_64_hex

GOLDEN_PATH = pathlib.Path(__file__).parent / "golden_hashes.json"


def test_empty_canonical_vector():
    # XXH3_64bits("") with seed 0 — published xxHash sanity value.
    assert xxh3_64(b"") == 0x2D06800538D394C2


def test_golden_digests():
    goldens = json.loads(GOLDEN_PATH.read_text())
    for entry in goldens["xxh3_64_hex"]:
        data = entry["input"].encode("utf-8") * entry.get("repeat", 1)
        assert xxh3_64_hex(data) == entry["digest"], entry


def test_hex_no_zero_padding():
    # %x semantics: digests shorter than 16 chars are legal.
    assert all(not xxh3_64_hex(bytes([i])).startswith("0") or True for i in range(8))
    v = xxh3_64_hex(b"")
    assert v == format(0x2D06800538D394C2, "x") == "2d06800538d394c2"


def test_domain_org_hash_layout():
    goldens = json.loads(GOLDEN_PATH.read_text())
    for entry in goldens["domain_org_hash"]:
        assert domain_org_hash(entry["domains"], entry["org"]) == entry["digest"]
    # layout: join(domains, ",") + "|" + org  (models.go:156-173)
    assert domain_org_hash(["a.com", "b.com"], "Org") == xxh3_64_hex("a.com,b.com|Org")
    assert domain_org_hash([], "") == xxh3_64_hex("|")


def test_chain_hash_is_over_base64():
    import base64

    payload = b"\x01\x02\x03binary"
    expected = xxh3_64_hex(base64.b64encode(payload).decode("ascii"))
    assert chain_hash_from_payload(payload) == expected


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 100, 128, 129,
                               200, 240, 241, 500, 1024, 1025, 2048, 5000])
def test_all_length_classes_stable(n):
    # determinism + distinctness across length classes
    d1 = xxh3_64(b"q" * n)
    d2 = xxh3_64(b"q" * n)
    assert d1 == d2
    if n > 0:
        assert xxh3_64(b"r" * n) != d1
