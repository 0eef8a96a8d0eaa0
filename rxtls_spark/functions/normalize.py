"""Domain normalization — exact reference semantics.

Re-expresses ``NormalizeDomain`` (/root/reference/internal/certlib/
models.go:282-313) in Python; locked by the 26 golden cases from
``domain_normalization_test.go:31-61`` (FIXTURES.md §5.1).

Branch order matters:
1. trim ASCII space;
2. junk gate: empty or contains space/tab/newline → return the trimmed
   input unchanged when it contains any of " :/" or equals "::1" or
   starts with "-", else "";
3. lowercase, strip ALL leading and trailing dots; empty → "";
4. label validation: any label starting/ending with "-", or a
   "*"-prefixed label that is not exactly "*", returns the
   lowercased/dot-stripped value unchanged (NOT the original);
5. wildcard "*." prefixes are preserved.
"""

from __future__ import annotations

# Exactly Go's ``unicode.IsSpace`` set (strings.TrimSpace trims these):
# Latin-1 fast path '\t' '\n' '\v' '\f' '\r' ' ' U+0085 U+00A0, plus the
# non-Latin-1 White_Space runes.  Python's no-arg str.strip() is a
# SUPERSET (it also trims U+001C-U+001F), so we trim this explicit set
# to stay byte-faithful to the reference (models.go:283).
GO_TRIM_SET = (
    "\t\n\v\f\r \x85\xa0"
    "\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)


# Per-process memo: domain strings repeat heavily across certificates
# (shared hosts/SANs), and normalization is pure — a bounded dict cache
# removes it from the hot path (measured 27→~2 µs/row).  Cleared when
# full rather than LRU-evicted: eviction bookkeeping costs more than a
# rare refill.
_MEMO: dict[str, str] = {}
_MEMO_MAX = 200_000

# see comment at the .lower() call site
_SIMPLE_LOWER = {0x0130: "i"}


def normalize_domain(domain: str) -> str:
    if domain is None:
        return ""
    hit = _MEMO.get(domain)
    if hit is not None:
        return hit
    out = _normalize_domain_uncached(domain)
    if len(_MEMO) >= _MEMO_MAX:
        _MEMO.clear()
    _MEMO[domain] = out
    return out


def _normalize_domain_uncached(domain: str) -> str:
    domain = domain.strip(GO_TRIM_SET)
    if domain == "" or any(c in domain for c in " \t\n"):
        if any(c in domain for c in " :/") or domain == "::1" or domain.startswith("-"):
            return domain
        return ""
    # Go strings.ToLower is the per-rune SIMPLE mapping: U+0130 'İ' →
    # 'i' (one rune).  Python str.lower applies the FULL mapping ('i' +
    # U+0307) — U+0130 is the only unconditional multi-char lowercase
    # in SpecialCasing.txt, so translating it first makes .lower()
    # rune-for-rune equal to Go.
    domain = domain.translate(_SIMPLE_LOWER).lower()
    domain = domain.lstrip(".").rstrip(".")
    if domain == "":
        return ""
    for part in domain.split("."):
        if part.startswith("-") or part.endswith("-"):
            return domain
        if part.startswith("*") and part != "*":
            return domain
    return domain


def normalized_domain_set(domains: list[str]) -> set[str]:
    """Non-empty normalized forms (models.go:133-142)."""
    out = set()
    for d in domains or []:
        n = normalize_domain(d)
        if n != "":
            out.add(n)
    return out


def sorted_normalized_domains(domains: list[str]) -> list[str]:
    """Sorted unique normalized domains (models.go:145-153).

    Go's ``sort.Strings`` is bytewise; Python's str sort on these
    values matches for ASCII domains (all generated data is ASCII).
    """
    return sorted(normalized_domain_set(domains))


def output_domains(sorted_normalized: list[str]) -> list[str]:
    """Strip a leading ``*.`` for the output list only (models.go:197-205)."""
    return [d[2:] if d.startswith("*.") else d for d in sorted_normalized]


# Set-level memo: SAN sets repeat heavily across certificates (one CA
# re-issuing for the same host set; measured ~19× repetition per Arrow
# batch on the bench corpus), and every derived view is a pure function
# of the raw domain tuple — so normalize+sort+strip runs once per
# distinct set instead of once per row.  Values are shared immutable-by-
# convention lists (consumers only serialize them).  Same bounded
# clear-when-full policy as _MEMO.
_DVIEW_MEMO: dict[tuple, tuple] = {}
_DVIEW_MEMO_MAX = 65_536


def domain_views(all_domains: list[str]) -> tuple:
    """(sorted_normalized, primary, output, csv) for one raw domain
    list, memoized on the raw tuple.  ``csv`` is ",".join(sorted
    normalized) — the org-hash input prefix (hashing.domain_org_hash)."""
    key = tuple(all_domains)
    hit = _DVIEW_MEMO.get(key)
    if hit is None:
        norm = sorted_normalized_domains(all_domains)
        hit = (norm, primary_domain(norm), output_domains(norm), ",".join(norm))
        if len(_DVIEW_MEMO) >= _DVIEW_MEMO_MAX:
            _DVIEW_MEMO.clear()
        _DVIEW_MEMO[key] = hit
    return hit


def primary_domain(sorted_normalized: list[str]) -> str:
    """First (lexicographic min) normalized domain, '' if none
    (models.go:206-209) — wildcard prefix is KEPT here."""
    return sorted_normalized[0] if sorted_normalized else ""
