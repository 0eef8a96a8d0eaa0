"""Pure-Python XXH3-64 (seed=0, default secret).

The reference hashes domain lists and DER blobs with XXH3-64
(``zeebo/xxh3`` — the Go port of the canonical xxHash XXH3), hex-encoded
via ``%x`` with no zero padding (/root/reference/internal/certlib/
models.go:127-130,156-173).  The sandbox has no ``xxhash`` wheel, so we
implement XXH3-64 from the public specification (xxHash repo,
``XXH3_64bits``).  Self-consistency is locked by golden values frozen in
``tests/golden_hashes.json``; the empty-input vector
``xxh3_64(b"") == 0x2d06800538d394c2`` is asserted as an external
sanity anchor.

Scalar implementation in pure ints; a batch helper hashes a pandas
Series of strings (used inside pandas UDFs — per-element Python, but
only invoked inside Arrow-batched UDFs, never per Spark Row).
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

PRIME32_1 = 0x9E3779B1
PRIME32_2 = 0x85EBCA77
PRIME32_3 = 0xC2B2AE3D
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
PRIME_MX1 = 0x165667919E3779F9
PRIME_MX2 = 0x9FB21C651E98DF25

# Canonical kSecret (192 bytes) from the public xxHash reference.
_K_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "716448971a0df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e"
)


def _r64(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 8], "little")


def _r32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 4], "little")


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _swap64(x: int) -> int:
    return int.from_bytes(x.to_bytes(8, "little"), "big")


def _mul128_fold64(a: int, b: int) -> int:
    m = a * b
    return (m & MASK64) ^ (m >> 64)


def _xxh64_avalanche(h: int) -> int:
    h &= MASK64
    h ^= h >> 33
    h = (h * PRIME64_2) & MASK64
    h ^= h >> 29
    h = (h * PRIME64_3) & MASK64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h: int) -> int:
    h &= MASK64
    h ^= h >> 37
    h = (h * PRIME_MX1) & MASK64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl(h, 49) ^ _rotl(h, 24)
    h = (h * PRIME_MX2) & MASK64
    h ^= (h >> 35) + length
    h &= MASK64
    h = (h * PRIME_MX2) & MASK64
    h ^= h >> 28
    return h


def _len_0(secret: bytes) -> int:
    return _xxh64_avalanche(_r64(secret, 56) ^ _r64(secret, 64))


def _len_1to3(data: bytes, secret: bytes) -> int:
    ln = len(data)
    c1, c2, c3 = data[0], data[ln >> 1], data[ln - 1]
    combined = ((c1 << 16) | (c2 << 24) | c3 | (ln << 8)) & 0xFFFFFFFF
    bitflip = (_r32(secret, 0) ^ _r32(secret, 4)) & MASK64
    return _xxh64_avalanche(combined ^ bitflip)


def _len_4to8(data: bytes, secret: bytes) -> int:
    ln = len(data)
    in1 = _r32(data, 0)
    in2 = _r32(data, ln - 4)
    bitflip = (_r64(secret, 8) ^ _r64(secret, 16)) & MASK64
    input64 = (in2 + (in1 << 32)) & MASK64
    return _rrmxmx(input64 ^ bitflip, ln)


def _len_9to16(data: bytes, secret: bytes) -> int:
    ln = len(data)
    bitflip1 = (_r64(secret, 24) ^ _r64(secret, 32)) & MASK64
    bitflip2 = (_r64(secret, 40) ^ _r64(secret, 48)) & MASK64
    input_lo = _r64(data, 0) ^ bitflip1
    input_hi = _r64(data, ln - 8) ^ bitflip2
    acc = (
        ln
        + _swap64(input_lo)
        + input_hi
        + _mul128_fold64(input_lo, input_hi)
    ) & MASK64
    return _xxh3_avalanche(acc)


def _mix16(data: bytes, doff: int, secret: bytes, soff: int) -> int:
    input_lo = _r64(data, doff) ^ _r64(secret, soff)
    input_hi = _r64(data, doff + 8) ^ _r64(secret, soff + 8)
    return _mul128_fold64(input_lo, input_hi)


def _len_17to128(data: bytes, secret: bytes) -> int:
    ln = len(data)
    acc = (ln * PRIME64_1) & MASK64
    if ln > 32:
        if ln > 64:
            if ln > 96:
                acc += _mix16(data, 48, secret, 96)
                acc += _mix16(data, ln - 64, secret, 112)
            acc += _mix16(data, 32, secret, 64)
            acc += _mix16(data, ln - 48, secret, 80)
        acc += _mix16(data, 16, secret, 32)
        acc += _mix16(data, ln - 32, secret, 48)
    acc += _mix16(data, 0, secret, 0)
    acc += _mix16(data, ln - 16, secret, 16)
    return _xxh3_avalanche(acc)


_MIDSIZE_START = 3
_MIDSIZE_LAST = 17


def _len_129to240(data: bytes, secret: bytes) -> int:
    ln = len(data)
    acc = (ln * PRIME64_1) & MASK64
    nb = ln // 16
    for i in range(8):
        acc += _mix16(data, 16 * i, secret, 16 * i)
    acc = _xxh3_avalanche(acc)
    for i in range(8, nb):
        acc += _mix16(data, 16 * i, secret, 16 * (i - 8) + _MIDSIZE_START)
    acc += _mix16(data, ln - 16, secret, 136 - _MIDSIZE_LAST)
    return _xxh3_avalanche(acc)


_INIT_ACC = (
    PRIME32_3,
    PRIME64_1,
    PRIME64_2,
    PRIME64_3,
    PRIME64_4,
    PRIME32_2,
    PRIME64_5,
    PRIME32_1,
)
_SECRET_LASTACC_START = 7
_SECRET_MERGEACCS_START = 11


def _accumulate_512(acc: list, data: bytes, doff: int, secret: bytes, soff: int) -> None:
    for i in range(8):
        dv = _r64(data, doff + 8 * i)
        dk = dv ^ _r64(secret, soff + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + dv) & MASK64
        acc[i] = (acc[i] + (dk & 0xFFFFFFFF) * (dk >> 32)) & MASK64


def _scramble(acc: list, secret: bytes, soff: int) -> None:
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _r64(secret, soff + 8 * i)
        acc[i] = (a * PRIME32_1) & MASK64


def _merge_accs(acc: list, secret: bytes, soff: int, start: int) -> int:
    result = start
    for i in range(4):
        result += _mul128_fold64(
            acc[2 * i] ^ _r64(secret, soff + 16 * i),
            acc[2 * i + 1] ^ _r64(secret, soff + 16 * i + 8),
        )
        result &= MASK64
    return _xxh3_avalanche(result)


def _hash_long(data: bytes, secret: bytes) -> int:
    ln = len(data)
    acc = list(_INIT_ACC)
    stripes_per_block = (len(secret) - 64) // 8  # 16 for the default secret
    block_len = 64 * stripes_per_block
    nb_blocks = (ln - 1) // block_len

    for n in range(nb_blocks):
        base = n * block_len
        for s in range(stripes_per_block):
            _accumulate_512(acc, data, base + 64 * s, secret, 8 * s)
        _scramble(acc, secret, len(secret) - 64)

    nb_stripes = ((ln - 1) - block_len * nb_blocks) // 64
    base = nb_blocks * block_len
    for s in range(nb_stripes):
        _accumulate_512(acc, data, base + 64 * s, secret, 8 * s)
    # last stripe
    _accumulate_512(acc, data, ln - 64, secret, len(secret) - 64 - _SECRET_LASTACC_START)

    return _merge_accs(
        acc, secret, _SECRET_MERGEACCS_START, (ln * PRIME64_1) & MASK64
    )


def xxh3_64(data: bytes) -> int:
    """XXH3-64 with seed=0 over ``data``; returns an unsigned 64-bit int."""
    ln = len(data)
    s = _K_SECRET
    if ln == 0:
        return _len_0(s)
    if ln <= 3:
        return _len_1to3(data, s)
    if ln <= 8:
        return _len_4to8(data, s)
    if ln <= 16:
        return _len_9to16(data, s)
    if ln <= 128:
        return _len_17to128(data, s)
    if ln <= 240:
        return _len_129to240(data, s)
    return _hash_long(data, s)


def xxh3_64_hex(data: bytes | str) -> str:
    """Hex digest with ``%x`` semantics (lowercase, NO zero padding) —
    byte-compatible with the reference's ``fmt.Sprintf("%x", ...)``
    (models.go:169-172)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return format(xxh3_64(data), "x")


def xxh3_series_hex(series) -> "object":
    """Hash a pandas Series of strings/bytes → Series of hex digests."""
    return series.map(
        lambda v: xxh3_64_hex(v if v is not None else b"")
    )
