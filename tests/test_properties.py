"""Property-based tests (hypothesis) for the pure scalar kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rxtls_spark.functions.normalize import GO_TRIM_SET, normalize_domain
from rxtls_spark.xxh3 import xxh3_64
from rxtls_spark.xxh3_vec import xxh3_64_batch


def _go_normalize(domain: str) -> str:
    """Straight-line transliteration of the reference algorithm
    (models.go:282-313), kept independent of the production code so the
    property below checks the implementation, not itself."""
    i, j = 0, len(domain)
    while i < j and domain[i] in GO_TRIM_SET:
        i += 1
    while j > i and domain[j - 1] in GO_TRIM_SET:
        j -= 1
    domain = domain[i:j]
    if domain == "" or any(c in domain for c in " \t\n"):
        if any(c in domain for c in " :/") or domain == "::1" or domain.startswith("-"):
            return domain
        return ""
    # Go's per-rune simple ToLower: U+0130 → 'i' (not 'i'+U+0307)
    domain = domain.replace("İ", "i").lower()
    while domain.startswith("."):
        domain = domain[1:]
    while domain.endswith("."):
        domain = domain[:-1]
    if domain == "":
        return ""
    for part in domain.split("."):
        if part.startswith("-") or part.endswith("-"):
            return domain
        if part.startswith("*") and part != "*":
            return domain
    return domain


@given(st.text(max_size=300))
@settings(max_examples=500, deadline=None)
def test_normalize_matches_reference_algorithm(s):
    """The real contract: agreement with the Go algorithm on arbitrary
    input.  (Idempotence does NOT hold in the reference — TrimSpace
    trims runes like '\\r' that the junk gate doesn't check, so a
    dot-strip can expose new leading whitespace on re-application.)"""
    assert normalize_domain(s) == _go_normalize(s)


# Alphabet on which idempotence DOES hold: dot-stripping can only
# expose whitespace the gate misses when the string contains trimmable
# runes outside the gate set {' ', '\t', '\n'} — exclude those.
_IDEMPOTENT_ALPHABET = st.characters(
    exclude_characters=[c for c in GO_TRIM_SET if c not in " \t\n"]
)


@given(st.text(alphabet=_IDEMPOTENT_ALPHABET, max_size=300))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_on_gate_closed_alphabet(s):
    once = normalize_domain(s)
    assert normalize_domain(once) == once


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_never_raises_and_lowercases_valid(s):
    out = normalize_domain(s)
    assert isinstance(out, str)
    # valid-looking outputs that went through the normal path have no
    # leading/trailing dots
    if out and " " not in out and "\t" not in out and out != s.strip():
        assert not out.startswith(".")


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_xxh3_batch_equals_scalar(data):
    assert int(xxh3_64_batch([data])[0]) == xxh3_64(data)


@given(st.lists(st.binary(max_size=600), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_xxh3_batch_order_independence(items):
    batch = xxh3_64_batch(items)
    individual = np.array([xxh3_64(b) for b in items], dtype=np.uint64)
    assert (batch == individual).all()


@given(st.binary(min_size=1, max_size=2000))
@settings(max_examples=200, deadline=None)
def test_parse_html_never_raises(buf):
    """The framing parser must reject arbitrary garbage cleanly —
    the reference's bounds-checked behavior (api.go:461-586)."""
    from rxtls_spark.reference import parse_html

    rec = parse_html(buf)
    assert rec is None or isinstance(rec, dict)


@given(st.integers(min_value=0, max_value=10**7), st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_roundtrip_encode_parse(doc_id, text):
    """Any doc_id/text encodes to a frame that parses back exactly
    (unless spec marks it malformed)."""
    from rxtls_spark import reference, spec

    buf = spec.html_bytes(doc_id, text)
    rec = reference.parse_html(buf)
    if spec.is_malformed(doc_id):
        assert rec is None
    else:
        assert rec is not None
        assert rec["extracted_text"] == text.encode("utf-8")
        assert rec["leaf_offset"] == doc_id
