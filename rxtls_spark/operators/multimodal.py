"""Multimodal columns: opaque binary payloads + typed metadata.

Driver mandate: treat image/audio/video as `binary` columns; implement
decode / feature-extract / resize / frame-sample as Arrow-batched UDFs
over mapInPandas.

**Image payloads are REAL PNGs** encoded and decoded with the Python
stdlib only (zlib + struct — no Pillow in this container): the writer
emits 8-bit gray / gray+alpha / RGB PNGs with filter-0 scanlines; the
reader is spec-complete for the common still-image subset (IHDR/IDAT/
IEND chunk walk with CRC verification, all five scanline filter types,
color types 0/2/4/6 at bit depth 8, non-interlaced).  The parse
discipline mirrors the reference's binary-framing contract (F10,
/root/reference/internal/certlib/api.go:461-586): length-prefixed
chunks, validated before use, malformed input quarantined not crashed.

**Audio payloads are REAL RIFF/WAVE files** written and parsed with the
stdlib `wave` module (16-bit PCM, 1-3 channels): the decoder surfaces
sample rate, frame count, channel count, decoded PCM byte size and mean
absolute amplitude with `decode_ok='real'`.

**Video payloads are REAL ANIMATED PNGs** (APNG — acTL/fcTL/fdAT
chunks, full-frame subset): the encoder extends the still-PNG writer
with the animation control chunks, the decoder validates the
consecutive sequence-number contract and inflates + unfilters every
frame.  `sample_frames` decodes the stream and re-emits every k-th
frame as a standalone still PNG — all three kinds now decode for real
(`decode_ok='real'`); anything unparseable is quarantined as
`malformed`, never crashed on.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KINDS = ["image", "audio", "video"]

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CH_TO_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # gray, gray+alpha, RGB, RGBA
_COLOR_TYPE_TO_CH = {v: k for k, v in _CH_TO_COLOR_TYPE.items()}


# ---------------------------------------------------------------------------
# stdlib PNG codec
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """8-bit PNG from an (h, w) or (h, w, ch) uint8 array — filter-0
    scanlines, single IDAT.  Pure stdlib (zlib + struct)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("png_encode wants uint8 pixels")
    h, w, ch = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_TO_COLOR_TYPE[ch], 0, 0, 0)
    # each scanline prefixed by its filter byte (0 = None)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §6: None/Sub/Up/Average/
    Paeth).  Filters 0 and 2 — the only ones our encoder emits — stay
    fully vectorized; 1/3/4 fall back to the per-byte recurrence the
    spec defines (they're sequential by construction)."""
    stride = w * ch
    data = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(h):
        ft = int(data[y, 0])
        line = data[y, 1:].astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub
            cur = line
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 3:  # Average
            cur = line
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def _png_chunks(payload: bytes):
    """CRC-validated (tag, data) chunk walk shared by the still and
    animated decoders.  Stops after IEND; raises ValueError on
    truncation or CRC mismatch."""
    if payload[:8] != PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC on {tag!r}")
        yield tag, data
        if tag == b"IEND":
            return
        pos += 12 + ln


def _parse_ihdr(ihdr: bytes) -> tuple[int, int, int]:
    """(w, h, ch) from a validated IHDR — rejects everything outside
    the supported subset (depth 8, color types 0/2/4/6,
    non-interlaced)."""
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant")
    if ctype not in _COLOR_TYPE_TO_CH or not (0 < w and 0 < h):
        raise ValueError("unsupported color type")
    return w, h, _COLOR_TYPE_TO_CH[ctype]


def _inflate_frame(parts: list[bytes], h: int, w: int, ch: int) -> np.ndarray:
    raw = zlib.decompress(b"".join(parts))
    if len(raw) != h * (w * ch + 1):
        raise ValueError("frame data length mismatch")
    return _unfilter(raw, h, w, ch)


def png_decode(payload: bytes) -> np.ndarray:
    """(h, w, ch) uint8 from PNG bytes — stdlib chunk walk with CRC
    checks.  Supports the still-image subset this pipeline produces
    and the common web case: bit depth 8, color types 0/2/4/6,
    non-interlaced.  Raises ValueError on anything malformed,
    including an ANIMATED png (use `apng_decode` — silently returning
    the first frame of a video would be a data bug)."""
    ihdr, idat = None, []
    for tag, data in _png_chunks(payload):
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"acTL":
            raise ValueError("animated PNG — use apng_decode")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if not idat:
        raise ValueError("missing IDAT")
    w, h, ch = _parse_ihdr(ihdr)
    return _inflate_frame(idat, h, w, ch)


# ---------------------------------------------------------------------------
# stdlib APNG codec (video frames)
# ---------------------------------------------------------------------------

def apng_encode(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Animated PNG from a list of same-shape uint8 frames — the
    spec's acTL/fcTL/fdAT chunk layout (all frames full-size at offset
    0, dispose/blend 0, delay 1/fps), filter-0 scanlines like
    `png_encode`.  This is a REAL video container a browser will play;
    pure stdlib."""
    if not frames:
        raise ValueError("apng_encode wants at least one frame")
    norm = [f[:, :, None] if f.ndim == 2 else f for f in frames]
    h, w, ch = norm[0].shape
    if any(f.shape != (h, w, ch) or f.dtype != np.uint8 for f in norm):
        raise ValueError("frames must share one uint8 (h, w, ch) shape")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CH_TO_COLOR_TYPE[ch], 0, 0, 0)
    out = [
        PNG_SIG,
        _png_chunk(b"IHDR", ihdr),
        _png_chunk(b"acTL", struct.pack(">II", len(norm), 0)),
    ]
    seq = 0
    for i, fr in enumerate(norm):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, 0, 0, 1, max(1, fps), 0, 0
        )
        seq += 1
        out.append(_png_chunk(b"fcTL", fctl))
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), fr.reshape(h, w * ch)], axis=1
        ).tobytes()
        comp = zlib.compress(raw)
        if i == 0:
            out.append(_png_chunk(b"IDAT", comp))
        else:
            out.append(_png_chunk(b"fdAT", struct.pack(">I", seq) + comp))
            seq += 1
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)


def is_apng(payload: bytes) -> bool:
    """Cheap animated-vs-still test: acTL must precede IDAT (spec), so
    scanning the chunk walk until either tag settles it."""
    try:
        for tag, _ in _png_chunks(payload):
            if tag == b"acTL":
                return True
            if tag == b"IDAT":
                return False
    except ValueError:
        return False
    return False


def apng_decode(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """(fps, frames) from APNG bytes — CRC-checked chunk walk,
    consecutive-sequence-number validation, full-frame subset only
    (every fcTL at the canvas size and offset 0, dispose/blend 0).
    Raises ValueError on anything malformed or outside the subset."""
    ihdr, actl = None, None
    frames_raw: list[list[bytes]] = []
    fctls: list[tuple] = []
    seqs: list[int] = []
    for tag, data in _png_chunks(payload):
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"acTL":
            if len(data) != 8:
                raise ValueError("bad acTL")
            actl = struct.unpack(">II", data)
        elif tag == b"fcTL":
            if len(data) != 26:
                raise ValueError("bad fcTL")
            f = struct.unpack(">IIIIIHHBB", data)
            seqs.append(f[0])
            fctls.append(f)
            frames_raw.append([])
        elif tag == b"IDAT":
            if not frames_raw:
                raise ValueError("IDAT before first fcTL")
            frames_raw[0].append(data)
        elif tag == b"fdAT":
            if len(data) < 4 or not frames_raw:
                raise ValueError("bad fdAT")
            seqs.append(struct.unpack_from(">I", data)[0])
            frames_raw[-1].append(data[4:])
        elif tag == b"IEND":
            break
    if actl is None:
        raise ValueError("not an APNG (no acTL)")
    w, h, ch = _parse_ihdr(ihdr)
    n_frames, _plays = actl
    if n_frames != len(fctls) or n_frames == 0:
        raise ValueError("acTL frame count mismatch")
    if seqs != list(range(len(seqs))):
        raise ValueError("non-consecutive APNG sequence numbers")
    fps = 0
    for _seq, fw, fh, fx, fy, dnum, dden, dispose, blend in fctls:
        if (fw, fh, fx, fy) != (w, h, 0, 0) or dispose != 0 or blend != 0:
            raise ValueError("sub-frame/dispose APNG outside subset")
        fps = dden // max(1, dnum)
    if any(not parts for parts in frames_raw):
        raise ValueError("fcTL with no frame data")
    frames = [_inflate_frame(parts, h, w, ch) for parts in frames_raw]
    return fps, frames


# ---------------------------------------------------------------------------
# stdlib WAV codec
# ---------------------------------------------------------------------------

def wav_encode(sample_rate: int, channels: int, samples: np.ndarray) -> bytes:
    """16-bit PCM RIFF/WAVE from an int16 sample array (interleaved,
    len = n_frames * channels).  Pure stdlib `wave`."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode wants int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(sample_rate, channels, n_frames, int16 samples) from WAV bytes.
    Raises wave.Error / ValueError on malformed input."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        frames = w.readframes(w.getnframes())
        return (
            w.getframerate(),
            w.getnchannels(),
            w.getnframes(),
            np.frombuffer(frames, dtype="<i2"),
        )


# ---------------------------------------------------------------------------
# synthetic media table
# ---------------------------------------------------------------------------

# video frame count per doc: small and deterministic — mirrored in the
# media oracle CTE (change together)
def video_n_frames(doc_id: int) -> int:
    return 2 + (doc_id % 6)


def media_payload(doc_id: int) -> bytes:
    """Deterministic payload per doc — ALL three kinds are genuine
    containers now: images are PNGs, audio is 16-bit PCM RIFF/WAVE,
    video is an ANIMATED PNG (acTL/fcTL/fdAT) with 2-7 full frames.
    Everything seeded by doc_id."""
    kind = doc_id % 3
    w = 16 + (doc_id % 48)
    h = 16 + (doc_id % 32)
    ch = 1 + (doc_id % 3)
    rng = np.random.RandomState(doc_id % (2**31))
    if kind == 0:
        px = rng.randint(0, 256, size=(h, w, ch), dtype=np.int64).astype(np.uint8)
        return png_encode(px)
    if kind == 1:
        n_frames = 256 + (doc_id % 1024)
        samples = rng.randint(
            -32768, 32768, size=n_frames * ch, dtype=np.int64
        ).astype(np.int16)
        return wav_encode(w * 100, ch, samples)
    frames = [
        rng.randint(0, 256, size=(h, w, ch), dtype=np.int64).astype(np.uint8)
        for _ in range(video_n_frames(doc_id))
    ]
    return apng_encode(frames, fps=8 + (doc_id % 23))


MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def media_df(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": [KINDS[i % 3] for i in ids],
                    "payload": [media_payload(int(i)) for i in ids],
                }
            )

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("body_bytes", LongType()),
        StructField("mean_value", DoubleType()),
        StructField("decode_ok", StringType()),
    ]
)


def _decode_real(payload: bytes) -> dict | None:
    """Real codec paths: stdlib PNG / APNG / RIFF-WAVE decode.  Returns
    None for unrecognized payloads — and for a payload that CLAIMS to
    be a PNG/APNG/WAV but fails validation — which `decode_media`
    quarantines as `malformed`.  Audio
    fills the spatial columns with its own axes — width := sample
    rate / 100, height := frame count — so every parsed quantity stays
    inside the fixed DECODED_SCHEMA.  Video (animated PNG) reports the
    frame dims with body_bytes = total decoded pixel bytes across all
    frames and mean over all frames."""
    if payload[:8] == PNG_SIG:
        try:
            if is_apng(payload):
                _fps, frames = apng_decode(payload)
                h, w, ch = frames[0].shape
                stack = np.stack(frames)
                return {
                    "width": int(w),
                    "height": int(h),
                    "channels": int(ch),
                    "body_bytes": int(stack.nbytes),
                    "mean_value": round(float(stack.mean()), 5),
                    "decode_ok": "real",
                }
            arr = png_decode(payload)
        except (ValueError, zlib.error):
            return None
        h, w, ch = arr.shape
        return {
            "width": int(w),
            "height": int(h),
            "channels": int(ch),
            "body_bytes": int(arr.nbytes),
            "mean_value": round(float(arr.mean()), 5),
            "decode_ok": "real",
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            rate, ch, n_frames, samples = wav_decode(payload)
        except (wave.Error, ValueError, EOFError):
            return None
        return {
            "width": int(rate // 100),
            "height": int(n_frames),
            "channels": int(ch),
            "body_bytes": int(samples.nbytes),
            # mean absolute amplitude of the decoded PCM stream
            "mean_value": round(
                float(np.abs(samples.astype(np.int64)).mean())
                if samples.size
                else 0.0,
                5,
            ),
            "decode_ok": "real",
        }
    return None


_MALFORMED = {
    "width": None, "height": None, "channels": None,
    "body_bytes": None, "mean_value": None, "decode_ok": "malformed",
}


def decode_media(media: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                rec = _decode_real(payload) or dict(_MALFORMED)
                rec.update({"doc_id": int(doc_id), "kind": kind})
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling for 'video' payloads: 1→N expansion inside
    mapInPandas (the UDTF shape).  The APNG is REALLY decoded (CRC
    walk + inflate + unfilter) and every k-th frame is re-emitted as a
    standalone still PNG — the shape a vision-model preprocessing
    pipeline needs (sampled frames as independent images).  Malformed
    videos are skipped (quarantined by `decode_media` upstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                try:
                    _fps, decoded = apng_decode(bytes(payload))
                except (ValueError, zlib.error):
                    continue
                for i in range(0, len(decoded), every):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(png_encode(decoded[i]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames},
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_feature_counts(spark, sf_dir: str) -> DataFrame:
    """Aggregate over decoded media — the queries() surface."""
    dec = decode_media(media_df(spark, sf_dir))
    return dec.groupBy("kind", "decode_ok").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("body_bytes").cast("long").alias("total_bytes"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("out_bytes", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_media(media: DataFrame, box: int = 32) -> DataFrame:
    """Aspect-fit resize of 'image' payloads into a box×box bound over
    the REAL decoded PNG pixels (numpy nearest-neighbor gather on the
    de-filtered array).  Output dims are pure integer arithmetic on the
    decoded (w, h), so the driver oracle predicts them exactly; the
    resized pixel bytes themselves stay out of the value compare (they
    depend on the seeded pixel content, locked by pytest instead)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                try:
                    img = png_decode(bytes(payload))
                except (ValueError, zlib.error):
                    continue  # malformed images are quarantined upstream
                h, w, ch = img.shape
                scale = min(box / w, box / h)
                ow = max(1, int(w * scale))
                oh = max(1, int(h * scale))
                yi = (np.arange(oh) * h // oh)
                xi = (np.arange(ow) * w // ow)
                out = img[yi][:, xi].tobytes()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "w": w, "h": h, "out_w": ow, "out_h": oh,
                        "out_bytes": len(out),
                        "pixels": out,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual hashing (aHash) — image dedup
# ---------------------------------------------------------------------------

# Duplicate-image injection spec — MIRRORED in the `media_phash` oracle
# SQL (queries_training.py); change together.  Every image doc with
# doc_id % PHASH_DUP_MOD == PHASH_DUP_OFF carries the payload GENERATED
# FOR doc_id - PHASH_DUP_OFF instead of its own; the mapping is
# idempotent by construction (the source id is ≡ 0 mod PHASH_DUP_MOD,
# which never satisfies the rule — no chains), and both PHASH_DUP_OFF
# and PHASH_DUP_MOD are multiples of 3 so source ids stay image-kind.
PHASH_DUP_MOD = 63
PHASH_DUP_OFF = 21
PHASH_GRID = 16  # nearest-neighbor downsample grid feeding the 8x8 hash


def ahash_halves(img: np.ndarray) -> tuple[int, int]:
    """Average-hash of a decoded (h, w, ch) uint8 image, as TWO 32-bit
    BIGINT-safe halves (the hamming_codes packing discipline — one
    64-bit word would set the sign bit).  All-integer pipeline so the
    hash is exactly reproducible: channel-sum grayscale, nearest-
    neighbor gather onto a PHASH_GRID² lattice (the resize_media index
    formula), 2×2 equal-area block sums onto 8×8, then the strictly-
    greater-than-mean rule via the cross-multiplied integer compare
    bs·64 > Σbs (ties → 0; no float mean anywhere)."""
    h, w, _ch = img.shape
    g = img.astype(np.int64).sum(axis=2)
    yi = np.arange(PHASH_GRID) * h // PHASH_GRID
    xi = np.arange(PHASH_GRID) * w // PHASH_GRID
    s = g[yi][:, xi]
    b = s.reshape(8, 2, 8, 2).sum(axis=(1, 3))
    total = int(b.sum())
    bits = (b * 64 > total).flatten()
    hi = 0
    lo = 0
    for i in range(32):
        hi = (hi << 1) | int(bits[i])
        lo = (lo << 1) | int(bits[32 + i])
    return hi, lo


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash_hi", LongType()),
        StructField("phash_lo", LongType()),
    ]
)


def image_phash_df(spark, sf_dir: str) -> DataFrame:
    """(doc_id, phash_hi, phash_lo) for every image doc, with the
    PHASH_DUP_MOD/OFF duplicate payloads injected — the perceptual-hash
    leg of multimodal dedup.  The payload is genuinely encoded and then
    decoded through the real PNG codec (round-trip, not a shortcut), so
    the hash covers the container path end-to-end.

    Scale shape: Arrow-batched mapInPandas decode (the expensive leg),
    then the caller's ONE hash agg on the 64-bit key — the exact-dedup
    plan with a perceptual key."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 0)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for doc_id in pdf["doc_id"].astype("int64"):
                d = int(doc_id)
                src = (
                    d - PHASH_DUP_OFF
                    if d % PHASH_DUP_MOD == PHASH_DUP_OFF
                    else d
                )
                img = png_decode(media_payload(src))
                hi, lo = ahash_halves(img)
                ids.append(d)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {"doc_id": ids, "phash_hi": his, "phash_lo": los}
            )

    return docs.mapInPandas(run, schema=PHASH_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sr", LongType()),
        StructField("ch", LongType()),
        StructField("n_frames", LongType()),
        StructField("sum_sq", LongType()),
        StructField("zcr", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over REAL WAV payloads
    (the audio leg of decode/feature-extract: RMS energy and
    zero-crossing rate are the classic first two frame features of
    any audio pipeline) — emitted as EXACT integers so the pytest
    lock is bit-exact: sum_sq = Σ s² over all samples (≤ n·ch·2³⁰ —
    BIGINT-safe to ~2³³ samples/clip), zcr = per-channel count of
    adjacent sample pairs with s[i-1]·s[i] < 0, summed over
    channels (the strict sign-change convention: zeros break runs
    without counting)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sr", "ch", "n_frames",
                                   "sum_sq", "zcr")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sr, ch, nf, samples = wav_decode(bytes(payload))
                arr = samples.astype(np.int64).reshape(nf, ch)
                prod = arr[1:] * arr[:-1]
                out["doc_id"].append(int(doc_id))
                out["sr"].append(int(sr))
                out["ch"].append(int(ch))
                out["n_frames"].append(int(nf))
                out["sum_sq"].append(int((arr * arr).sum()))
                out["zcr"].append(int((prod < 0).sum()))
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").mapInPandas(
        gen, AUDIO_FEATURES_SCHEMA
    )
