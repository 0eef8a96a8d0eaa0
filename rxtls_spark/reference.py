"""Pure-pandas reference extractor — the byte-identity oracle.

Straight-line, no Spark: decodes one framed ``html`` record at a time
with the same failure modes as the reference's
``ParseCertificateEntry`` (/root/reference/internal/certlib/
api.go:461-586): version byte must be 0, leaf type 0, uint64-BE
timestamp, uint16-BE entry type (0=x509 → "X509LogEntry", 1=precert →
"PrecertLogEntry" with a 32-byte issuer-key-hash skipped first),
uint24-BE bounds-checked payload length, then a uint16-BE extensions
length that is skipped (a missing/truncated length is tolerated as EOF,
api.go:551-556; an empty payload is rejected, api.go:570-572).  Any
other violation → None (parse failure, counted, P5
domain_extractor.go:649-659).

The Spark parse UDF (operators/parse.py) must produce records equal to
this extractor for every url — tests/test_parse.py asserts it.
"""

from __future__ import annotations

import base64
import struct
from typing import Any

from rxtls_spark.functions.hashing import chain_hash_from_payload, domain_org_hash
from rxtls_spark.functions.normalize import (
    normalize_domain,
    output_domains,
    primary_domain,
    sorted_normalized_domains,
)

_INT_KEYS = {"not_before", "not_after", "leaf_offset"}


def parse_html(buf: bytes, want_text: bool = True) -> dict[str, Any] | None:
    """Decode one framed record → flat dict, or None on malformed input.

    ``want_text=False`` skips the base64 text decode (projection
    pushdown for consumers that never read extracted_text)."""
    if buf is None or len(buf) < 15:
        return None
    if buf[0] != 0 or buf[1] != 0:
        return None
    ts_ms = struct.unpack_from(">Q", buf, 2)[0]
    et = struct.unpack_from(">H", buf, 10)[0]
    pos = 12
    if et == 1:
        pos += 32  # issuer key hash, skipped (api.go:520-524)
    elif et != 0:
        return None
    if pos + 3 > len(buf):
        return None
    plen = int.from_bytes(buf[pos : pos + 3], "big")
    pos += 3
    if pos + plen > len(buf):
        return None  # oversized/truncated — bounds check (api.go:500-509)
    payload = buf[pos : pos + plen]
    pos += plen
    if pos + 2 <= len(buf):
        ext_len = struct.unpack_from(">H", buf, pos)[0]
        pos += 2
        if ext_len and pos + ext_len > len(buf):
            return None  # declared extensions exceed remaining (api.go:558-560)
    # else: missing/truncated extensions length — the reference tolerates
    # EOF here and continues (api.go:551-556)
    if plen == 0:
        return None  # no certificate DER extracted (api.go:570-572)

    fields: dict[str, Any] = {
        "entry_type": "PrecertLogEntry" if et == 1 else "X509LogEntry",
        "ts_ms": ts_ms,
        "issuer_cn": "",
        "subject_cn": "",
        "subject_o": "",
        "subject_c": "",
        "subject_st": "",
        "subject_l": "",
        "not_before": None,
        "not_after": None,
        "leaf_offset": None,
        "extracted_text": b"",
    }
    sans: list[str] = []
    try:
        for line in payload.decode("utf-8").split("\n"):
            if not line:
                continue
            key, _, value = line.partition("=")
            if key == "san":
                sans.append(value)
            elif key == "text":
                if want_text:
                    fields["extracted_text"] = base64.b64decode(value)
            elif key in _INT_KEYS:
                fields[key] = int(value)
            elif key in fields:
                fields[key] = value
    except (UnicodeDecodeError, ValueError):
        return None

    # first-seen dedup of [CN if non-empty] + SANs (models.go:265-277)
    doms = ([fields["subject_cn"]] if fields["subject_cn"] else []) + sans
    seen: set[str] = set()
    all_doms = [d for d in doms if not (d in seen or seen.add(d))]
    fields["all_domains"] = all_doms
    fields["payload"] = bytes(payload)
    return fields


def enrich_record(rec: dict[str, Any]) -> dict[str, Any]:
    """Add normalized/derived fields (models.go:133-223 composition)."""
    norm = sorted_normalized_domains(rec["all_domains"])
    rec["normalized_domains"] = norm
    rec["primary_domain"] = primary_domain(norm)
    rec["output_domains"] = output_domains(norm)
    rec["normalized_cn"] = normalize_domain(rec["subject_cn"])
    rec["domain_org_hash"] = domain_org_hash(norm, rec["subject_o"])
    rec["chain_hash"] = chain_hash_from_payload(rec["payload"])
    return rec


def extract(buf: bytes) -> dict[str, Any] | None:
    rec = parse_html(buf)
    return enrich_record(rec) if rec is not None else None


def to_domains_csv_line(rec: dict[str, Any], cert_index: int) -> str:
    """Byte-identical domains CSV line (models.go:194-223) — naive
    quoting, comma-joined domains inside an unquoted field; locked by
    models_test.go:125-128 / FIXTURES.md §5.4."""
    return (
        f"{cert_index},{rec['normalized_cn']},{rec['primary_domain']},"
        f"{','.join(rec['output_domains'])},{rec['subject_c']},"
        f'"{rec["subject_st"]}","{rec["subject_l"]}","{rec["subject_o"]}",'
        f'"{rec["issuer_cn"]}",{rec["domain_org_hash"]}\n'
    )
