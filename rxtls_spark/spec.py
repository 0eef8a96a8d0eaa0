"""Deterministic `pages` specification — the single source of truth.

The target pipeline (BASELINE.json north_rule) operates on a
Common-Crawl-style table ``pages(url, warc_ts, html binary, text,
lang)``.  The sandbox has no such table, so we synthesise it
deterministically from the driver-provided ``documents`` parquet
(doc_id, text, lang, source, n_chars): every generated field is a pure
integer formula of ``doc_id`` so the DuckDB oracle can recompute any
aggregate **without touching the binary** — that makes the oracle a
genuinely independent check of the whole encode→parse→normalize→
enrich→route chain.

The ``html`` binary framing mirrors the MerkleTreeLeaf framing the
reference parses (/root/reference/internal/certlib/api.go:461-586):
version byte, leaf type, uint64-BE timestamp, uint16-BE entry type,
optional 32-byte issuer-key-hash (precert), uint24-BE payload length
(bounds-checked), payload, uint16-BE extensions length.  ~2% of rows
are deliberately malformed (three kinds) to exercise the parse-failure
path (domain_extractor.go:649-659).
"""

from __future__ import annotations

import base64
import struct

# ---------------------------------------------------------------------------
# Generation constants (mirrored into oracle SQL by queries.py)
# ---------------------------------------------------------------------------

WARC_EPOCH = 1767225600  # 2026-01-01T00:00:00Z
WARC_SPAN = 2592000  # 30 days in seconds
WARC_STEP = 193

SUFFIXES = ["com", "net", "org", "io", "de", "co.uk", "fr", "jp", "app", "dev"]

SUFFIX_GROUPS = {
    "com": "gtld",
    "net": "gtld",
    "org": "gtld",
    "io": "newtld",
    "app": "newtld",
    "dev": "newtld",
    "de": "cctld-eu",
    "fr": "cctld-eu",
    "co.uk": "cctld-eu",
    "jp": "cctld-apac",
}

# Extra suffixes present in the lookup table but never generated (route
# table realism; longest-match must not be confused by e.g. "uk" vs "co.uk").
EXTRA_SUFFIXES = {
    "uk": "cctld-eu", "es": "cctld-eu", "it": "cctld-eu", "nl": "cctld-eu",
    "pl": "cctld-eu", "se": "cctld-eu", "ch": "cctld-eu", "at": "cctld-eu",
    "cn": "cctld-apac", "kr": "cctld-apac", "in": "cctld-apac",
    "au": "cctld-apac", "nz": "cctld-apac", "sg": "cctld-apac",
    "co": "gtld", "info": "gtld", "biz": "gtld", "xyz": "newtld",
    "cloud": "newtld", "tech": "newtld", "ai": "newtld", "sh": "newtld",
    "us": "cctld-na", "ca": "cctld-na", "mx": "cctld-na",
    "br": "cctld-sa", "ar": "cctld-sa",
    "ac.uk": "cctld-eu", "org.uk": "cctld-eu", "co.jp": "cctld-apac",
    "ne.jp": "cctld-apac", "com.au": "cctld-apac", "com.cn": "cctld-apac",
}

# 21 operators, analog of all_logs_list.json's 21-operator catalog
# (/root/reference/all_logs_list.json; state machine api.go:235-244).
OPERATOR_NAMES = [
    "Google", "Cloudflare", "DigiCert", "Sectigo", "Let's Encrypt",
    "TrustAsia", "SSL.com", "Entrust", "GlobalSign", "IdenTrust",
    "Amazon", "Microsoft", "Apple", "Mozilla", "Certainly",
    "Izenpe", "Actalis", "Buypass", "Camerfirma", "HARICA", "WoSign",
]

# operator_id -> state; rejected/retired/test are filtered before
# enrichment (P1, api.go:235-244) so their pages enrich to ''.
OPERATOR_STATES = {
    19: "rejected",
    20: "retired",
    18: "test",
    17: "readonly",
    16: "pending",
}  # everything else: "usable"

COUNTRIES = ["US", "DE", "GB", "FR", "JP", "NL", "ES", "CN"]

ISSUER_TLDS = ["com", "org", "net"]

N_HOT_HOSTS = 3  # 15% + 10% + 7% of rows — the skew to salt away
N_TAIL_HOSTS = 37


# ---------------------------------------------------------------------------
# Pure per-row formulas (doc_id -> field). Keep each mirrorable in SQL.
# ---------------------------------------------------------------------------

def host_idx(doc_id: int) -> int:
    b = doc_id % 100
    if b < 15:
        return 0
    if b < 25:
        return 1
    if b < 32:
        return 2
    return 3 + (doc_id % N_TAIL_HOSTS)


def host(doc_id: int) -> str:
    i = host_idx(doc_id)
    return f"site{i}.{SUFFIXES[i % 10]}"


def url(doc_id: int) -> str:
    return f"https://{host(doc_id)}/p/{doc_id}"


def warc_epoch_s(doc_id: int) -> int:
    return WARC_EPOCH + (doc_id * WARC_STEP) % WARC_SPAN


def operator_id(doc_id: int) -> int:
    return doc_id % 21 + 1


def issuer_cn_for_op(op: int) -> str:
    return f"ca{op}.example-ca.{ISSUER_TLDS[op % 3]}"


def issuer_cn(doc_id: int) -> str:
    return issuer_cn_for_op(operator_id(doc_id))


def subject_o(doc_id: int) -> str:
    return f"Org {operator_id(doc_id)}"


def subject_c(doc_id: int) -> str:
    return COUNTRIES[doc_id % 8]


def subject_st(doc_id: int) -> str:
    return f"State{doc_id % 5}"


def subject_l(doc_id: int) -> str:
    return f"City{doc_id % 9}"


def subject_cn(doc_id: int) -> str:
    h = host(doc_id)
    if doc_id % 11 == 0:
        return f"*.{h}"
    if doc_id % 13 == 0:
        return h.upper()
    if doc_id % 17 == 0:
        return h + "."
    return h


def sans(doc_id: int) -> list[str]:
    h = host(doc_id)
    k = doc_id % 5
    out = [f"alt{j}.{h}" for j in range(k)]
    if doc_id % 19 == 0 and k > 0:
        out[0] = out[0].upper()
    if doc_id % 23 == 0 and k > 1:
        out[1] = out[0]  # duplicate — exercises first-seen dedup
    return out


def not_before(doc_id: int) -> int:
    return 1700000000 + (doc_id % 1000) * 86400


def not_after(doc_id: int) -> int:
    return not_before(doc_id) + 7776000


def entry_type(doc_id: int) -> int:
    return 1 if doc_id % 7 == 3 else 0


def is_malformed(doc_id: int) -> bool:
    return doc_id % 50 == 13


def malformed_kind(doc_id: int) -> int:
    """0=bad version byte, 1=truncated buffer, 2=oversized uint24 length."""
    return (doc_id // 50) % 3


# ---------------------------------------------------------------------------
# Binary framing — encode (datagen) and field list
# ---------------------------------------------------------------------------

PAYLOAD_KEYS = (
    "issuer_cn subject_cn subject_o subject_c subject_st subject_l "
    "not_before not_after leaf_offset"
).split()


def payload_bytes(doc_id: int, text: str) -> bytes:
    lines = [
        f"issuer_cn={issuer_cn(doc_id)}",
        f"subject_cn={subject_cn(doc_id)}",
        f"subject_o={subject_o(doc_id)}",
        f"subject_c={subject_c(doc_id)}",
        f"subject_st={subject_st(doc_id)}",
        f"subject_l={subject_l(doc_id)}",
        f"not_before={not_before(doc_id)}",
        f"not_after={not_after(doc_id)}",
    ]
    lines += [f"san={s}" for s in sans(doc_id)]
    lines.append(f"leaf_offset={doc_id}")
    b64 = base64.b64encode((text or "").encode("utf-8")).decode("ascii")
    lines.append(f"text={b64}")
    return "\n".join(lines).encode("utf-8")


def html_bytes(doc_id: int, text: str) -> bytes:
    """Encode one framed record (FIXTURES.md §3)."""
    et = entry_type(doc_id)
    payload = payload_bytes(doc_id, text)
    parts = [
        b"\x00",                                   # version
        b"\x00",                                   # leaf_type
        struct.pack(">Q", warc_epoch_s(doc_id) * 1000),  # ts ms
        struct.pack(">H", et),                     # entry type
    ]
    if et == 1:
        # 32-byte issuer key hash (skipped by parser, api.go:520-524)
        parts.append((doc_id % 251).to_bytes(1, "big") * 32)
    declared_len = len(payload)
    if is_malformed(doc_id) and malformed_kind(doc_id) == 2:
        declared_len = len(payload) + 1000  # oversized uint24 — bounds check
    parts.append(struct.pack(">I", declared_len)[1:])  # uint24 BE
    parts.append(payload)
    ext_len = doc_id % 3
    parts.append(struct.pack(">H", ext_len))
    parts.append(b"\xee" * ext_len)
    buf = b"".join(parts)
    if is_malformed(doc_id):
        kind = malformed_kind(doc_id)
        if kind == 0:
            buf = b"\xff" + buf[1:]  # bad version byte
        elif kind == 1:
            buf = buf[: max(2, len(buf) // 2)]  # truncated
    return buf


def all_domains(doc_id: int) -> list[str]:
    """First-seen dedup of [CN if non-empty] + SANs (models.go:265-277)."""
    doms = []
    cn = subject_cn(doc_id)
    if cn:
        doms.append(cn)
    doms.extend(sans(doc_id))
    seen, out = set(), []
    for d in doms:
        if d not in seen:
            seen.add(d)
            out.append(d)
    return out
