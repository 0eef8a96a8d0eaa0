"""Golden tests for NormalizeDomain — the 26 cases from the reference
(/root/reference/internal/certlib/domain_normalization_test.go:31-61,
mirrored in FIXTURES.md §5.1) plus the derived pipeline composition
(models_test.go:48-135 structure)."""

import pytest

from rxtls_spark.functions.normalize import (
    normalize_domain,
    output_domains,
    primary_domain,
    sorted_normalized_domains,
)

GOLDEN = [
    ("example.com", "example.com"),
    ("www.example.com", "www.example.com"),
    ("EXAMPLE.COM", "example.com"),
    ("Www.Example.Com", "www.example.com"),
    ("example.com.", "example.com"),
    ("example.com...", "example.com"),
    (".example.com", "example.com"),
    (".example.com.", "example.com"),
    ("  example.com  ", "example.com"),
    ("*.example.com", "*.example.com"),
    ("*.EXAMPLE.COM", "*.example.com"),
    ("*.example.com.", "*.example.com"),
    ("*.*.example.com", "*.*.example.com"),
    ("xn--bcher-kva.example.com", "xn--bcher-kva.example.com"),
    ("XN--BCHER-KVA.EXAMPLE.COM", "xn--bcher-kva.example.com"),
    ("", ""),
    ("   ", ""),
    ("...", ""),
    ("192.168.1.1", "192.168.1.1"),
    ("::1", "::1"),
    ("example.com:443", "example.com:443"),
    ("example test.com", "example test.com"),
    ("-example.com", "-example.com"),
    ("example-.com", "example-.com"),
    ("a." * 100 + "com", "a." * 100 + "com"),
    ("*x.example.com", "*x.example.com"),  # invalid wildcard label → unchanged
    # Unicode whitespace parity with Go strings.TrimSpace
    # (unicode.IsSpace: models.go:283 via strings.TrimSpace) — NBSP,
    # NEL, ideographic space, thin space are all trimmed.
    ("\xa0example.com", "example.com"),
    ("example.com\xa0", "example.com"),
    ("\x85EXAMPLE.COM\x85", "example.com"),
    ("　example.com ", "example.com"),
    ("\xa0\x85 ", ""),  # all-whitespace → trimmed empty → ""
    # Go strings.ToLower is per-rune SIMPLE case: İ (U+0130) → 'i',
    # never 'i'+combining-dot (Python's full mapping)
    ("İSTANBUL.COM", "istanbul.com"),
]


@pytest.mark.parametrize("inp,expected", GOLDEN)
def test_normalize_domain_golden(inp, expected):
    assert normalize_domain(inp) == expected


def test_junk_branch_returns_trimmed():
    # whitespace-containing input with " :/" returns the *trimmed* value
    assert normalize_domain("  example test.com  ") == "example test.com"


def test_tab_only_junk_dropped():
    assert normalize_domain("exam\tple.com") == ""


def test_sorted_normalized_dedup():
    doms = ["Example.COM", "example.com.", "b.org", "*.a.net", ""]
    assert sorted_normalized_domains(doms) == ["*.a.net", "b.org", "example.com"]


def test_primary_and_output_domains():
    norm = sorted_normalized_domains(["*.example.com", "www.example.com"])
    assert norm == ["*.example.com", "www.example.com"]
    assert primary_domain(norm) == "*.example.com"  # wildcard kept in primary
    assert output_domains(norm) == ["example.com", "www.example.com"]  # stripped


def test_empty_list():
    assert primary_domain([]) == ""
    assert output_domains([]) == []
