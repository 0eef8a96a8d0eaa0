"""Batch framing parser — vectorized header decode over an Arrow batch.

``parse_batch(bufs)`` must be element-wise identical to
``[reference.parse_html(b) for b in bufs]`` (the scalar spec, itself a
transliteration of /root/reference/internal/certlib/api.go:461-586);
tests/test_parse_vec.py fuzzes that equality.  The fixed-offset header
fields (version, leaf type, uint64-BE timestamp, uint16-BE entry type,
uint24-BE payload length, uint16-BE extensions length) are decoded with
one numpy pass per field across the whole batch; only the variable
key=value payload walk remains per-row Python.

Like xxh3.py/xxh3_vec.py: reference.py stays the readable scalar spec,
this module is the hot path used by the pandas UDFs.
"""

from __future__ import annotations

from binascii import a2b_base64
from typing import Any

import numpy as np

# 256^7 .. 256^0 — big-endian uint64 reassembly weights
_POW8 = np.left_shift(np.uint64(1), np.arange(56, -1, -8).astype(np.uint64))

_INT_KEYS = ("not_before", "not_after", "leaf_offset")

# Field dict as it exists DURING the key=value walk (reference.py:65-78):
# entry_type/ts_ms are present and therefore overwritable by payload
# lines, all_domains/payload are added after and therefore not.
_BASE: dict[str, Any] = {
    "entry_type": "",
    "ts_ms": 0,
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

# Single-lookup dispatch for the walk: replaces the reference's 4-branch
# comparison chain (== "san" / == "text" / in _INT_KEYS / in fields) with
# one dict probe.  Kinds: 1 = san append, 2 = text (base64, only under
# want_text), 3 = int field, 4 = plain string field.  Exactly the keys
# the reference chain can match: _INT_KEYS as kind 3, every _BASE key
# that is not an int key as kind 4 ("entry_type"/"ts_ms"/
# "extracted_text" are overwritable mid-walk, reference.py:97-98), and
# any other key falls through unmatched in both implementations.
_KIND: dict[str, int] = {"san": 1, "text": 2}
_KIND.update({k: 3 for k in _INT_KEYS})
_KIND.update({k: 4 for k in _BASE if k not in _KIND})


def parse_batch(
    bufs: list[bytes | None], want_text: bool = True
) -> list[dict[str, Any] | None]:
    """Decode a batch of framed records; None per malformed row."""
    n = len(bufs)
    out: list[dict[str, Any] | None] = [None] * n
    if n == 0:
        return out
    bl: list[bytes | None] = [
        b if (b is None or type(b) is bytes) else bytes(b) for b in bufs
    ]
    lens = np.fromiter((-1 if b is None else len(b) for b in bl), np.int64, count=n)

    rows = np.nonzero(lens >= 15)[0]
    if rows.size == 0:
        return out

    # --- header: 12 fixed bytes per candidate row, one numpy pass ---
    hdr = np.frombuffer(b"".join(bl[i][:12] for i in rows), np.uint8).reshape(-1, 12)
    et = hdr[:, 10].astype(np.int64) * 256 + hdr[:, 11]
    keep = (hdr[:, 0] == 0) & (hdr[:, 1] == 0) & ((et == 0) | (et == 1))
    ts = (hdr[:, 2:10].astype(np.uint64) * _POW8).sum(axis=1)  # stays uint64

    pos = np.where(et == 1, 44, 12)  # precert skips 32-byte issuer key hash
    keep &= pos + 3 <= lens[rows]
    if not keep.any():
        return out
    rows, et, ts, pos = rows[keep], et[keep], ts[keep], pos[keep]

    # --- uint24-BE payload length + bounds (api.go:500-509) ---
    tri = np.frombuffer(
        b"".join(bl[i][p : p + 3] for i, p in zip(rows, pos)), np.uint8
    ).reshape(-1, 3)
    plen = (
        tri[:, 0].astype(np.int64) * 65536
        + tri[:, 1].astype(np.int64) * 256
        + tri[:, 2]
    )
    body = pos + 3
    keep = (body + plen <= lens[rows]) & (plen > 0)
    if not keep.any():
        return out
    rows, et, ts, body, plen = rows[keep], et[keep], ts[keep], body[keep], plen[keep]

    # --- extensions: declared length must fit; missing length is EOF-
    # tolerated (api.go:551-560) ---
    end = body + plen
    has_ext = end + 2 <= lens[rows]
    if has_ext.any():
        pair = np.frombuffer(
            b"".join(bl[i][e : e + 2] for i, e in zip(rows[has_ext], end[has_ext])),
            np.uint8,
        ).reshape(-1, 2)
        ext_len = pair[:, 0].astype(np.int64) * 256 + pair[:, 1]
        bad = np.zeros(rows.shape, dtype=bool)
        bad[has_ext] = (ext_len > 0) & (end[has_ext] + 2 + ext_len > lens[rows[has_ext]])
        keep = ~bad
        rows, et, ts, body, end = rows[keep], et[keep], ts[keep], body[keep], end[keep]

    # --- per-row key=value payload walk (variable-length tail) ---
    # tolist() up front: bulk numpy→Python conversion is ~10× cheaper
    # than per-element scalar indexing inside the loop.  ts stays uint64
    # until tolist() so >=2^63 timestamps keep their unsigned value
    # (reference semantics: int(uint64 scalar) is exact).
    et_names = np.where(et == 1, "PrecertLogEntry", "X509LogEntry").tolist()
    base = _BASE
    kind_of = _KIND
    rows_l = rows.tolist()
    ts_l = ts.tolist()
    body_l = body.tolist()
    end_l = end.tolist()
    for k in range(len(rows_l)):
        i = rows_l[k]
        payload = bl[i][body_l[k] : end_l[k]]
        try:
            text = payload.decode("utf-8")
            f = base.copy()
            f["entry_type"] = et_names[k]
            f["ts_ms"] = ts_l[k]
            sans: list[str] = []
            for line in text.split("\n"):
                if not line:
                    continue
                key, _, value = line.partition("=")
                kind = kind_of.get(key)
                if kind is None:
                    continue
                if kind == 1:
                    sans.append(value)
                elif kind == 4:
                    f[key] = value
                elif kind == 3:
                    f[key] = int(value)
                elif want_text:  # kind == 2: text
                    f["extracted_text"] = a2b_base64(value)
        except (UnicodeDecodeError, ValueError):
            continue
        # first-seen dedup of [CN if non-empty] + SANs (models.go:265-277)
        cn = f["subject_cn"]
        doms = [cn] + sans if cn else sans
        seen: set[str] = set()
        f["all_domains"] = [d for d in doms if not (d in seen or seen.add(d))]
        f["payload"] = payload
        out[i] = f
    return out
