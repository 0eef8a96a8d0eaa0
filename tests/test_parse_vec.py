"""parse_batch (vectorized) must equal parse_html (scalar spec) —
element-wise, byte-identical, including every malformed shape."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rxtls_spark import spec
from rxtls_spark.parse_vec import parse_batch
from rxtls_spark.reference import parse_html


def test_spec_frames_batch_equals_scalar():
    bufs = [spec.html_bytes(i, f"text {i} " * (i % 7)) for i in range(3000)]
    bufs += [None, b"", b"\x00" * 14]
    got = parse_batch(bufs)
    want = [None if b is None else parse_html(b) for b in bufs]
    assert got == want


def test_want_text_false_matches():
    bufs = [spec.html_bytes(i, f"t{i}") for i in range(500)]
    got = parse_batch(bufs, want_text=False)
    want = [parse_html(b, want_text=False) for b in bufs]
    assert got == want


@pytest.mark.parametrize("cut", range(0, 40, 3))
def test_truncation_sweep(cut):
    """Every truncation point of a valid frame agrees with the scalar
    parser — exercises each bounds check (incl. the EOF-tolerated
    extensions length, api.go:551-556)."""
    full = spec.html_bytes(7, "hello world")
    buf = full[: len(full) - cut]
    assert parse_batch([buf]) == [parse_html(buf)]


@given(st.lists(st.binary(max_size=400), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_fuzz_batch_equals_scalar(bufs):
    assert parse_batch(bufs) == [parse_html(b) for b in bufs]


@given(st.binary(min_size=15, max_size=200))
@settings(max_examples=200, deadline=None)
def test_fuzz_headerlike_frames(tail):
    """Frames that pass the version/leaf gate but have arbitrary tails —
    concentrates fuzz on the length/bounds arithmetic."""
    for et in (b"\x00\x00", b"\x00\x01", b"\x00\x02"):
        buf = b"\x00\x00" + b"\x00" * 8 + et + tail
        assert parse_batch([buf]) == [parse_html(buf)]


def test_mixed_valid_invalid_alignment():
    """None rows must not shift the index mapping of valid rows."""
    valid = spec.html_bytes(4, "abc")
    bufs = [None, valid, b"junk", valid, b"", valid]
    got = parse_batch(bufs)
    assert got[0] is None and got[2] is None and got[4] is None
    ref = parse_html(valid)
    assert got[1] == ref and got[3] == ref and got[5] == ref


def test_entry_type_and_ts_overwritable_by_payload_lines():
    """The scalar parser's `key in fields` walk lets payload lines
    overwrite entry_type/ts_ms — the batch parser must mirror that."""
    payload = b"entry_type=ZZZ\nts_ms=abc\nsubject_cn=x.com"
    buf = (
        b"\x00\x00" + (1234).to_bytes(8, "big") + b"\x00\x00"
        + len(payload).to_bytes(3, "big") + payload + b"\x00\x00"
    )
    got = parse_batch([buf])[0]
    want = parse_html(buf)
    assert got == want
    assert got["entry_type"] == "ZZZ" and got["ts_ms"] == "abc"


def test_memoryview_and_bytearray_inputs():
    raw = spec.html_bytes(11, "mv")
    assert (
        parse_batch([memoryview(raw), bytearray(raw)])
        == [parse_html(raw)] * 2
    )


def test_uint64_timestamp_no_int64_wrap():
    """ts ≥ 2^63 must round-trip exactly (uint64, not int64)."""
    payload = b"subject_cn=a.com"
    buf = (
        b"\x00\x00" + (2**64 - 2).to_bytes(8, "big") + b"\x00\x00"
        + len(payload).to_bytes(3, "big") + payload + b"\x00\x00"
    )
    got = parse_batch([buf])[0]
    assert got == parse_html(buf)
    assert got["ts_ms"] == 2**64 - 2


def test_large_batch_dtype_stability():
    rng = np.random.default_rng(0)
    bufs = []
    for i in range(2000):
        b = spec.html_bytes(i, "x" * int(rng.integers(0, 50)))
        if i % 5 == 0:
            b = bytes(rng.integers(0, 256, size=int(rng.integers(1, 60)), dtype=np.uint8))
        bufs.append(b)
    assert parse_batch(bufs) == [parse_html(b) for b in bufs]
