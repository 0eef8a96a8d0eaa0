"""Multimodal codec + plumbing tests.

Images are REAL PNGs (stdlib zlib + struct), audio is REAL 16-bit PCM
WAV (stdlib wave), and video is a REAL ANIMATED PNG (APNG —
acTL/fcTL/fdAT): every codec must round-trip exactly, reject corrupt
bytes, and drive decode with `decode_ok='real'`."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from rxtls_spark.operators.multimodal import media_df

    return media_df(spark, SF_SMOKE).cache()


# ---------------------------------------------------------------------------
# PNG codec unit tests (pure Python, no Spark)
# ---------------------------------------------------------------------------

def test_png_roundtrip_all_color_types():
    from rxtls_spark.operators.multimodal import png_decode, png_encode

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        arr = rng.randint(0, 256, size=(11, 17, ch)).astype(np.uint8)
        out = png_decode(png_encode(arr))
        assert out.shape == (11, 17, ch)
        assert np.array_equal(out, arr), f"roundtrip failed for ch={ch}"


def _filter_scanlines(arr: np.ndarray, filter_types: list[int]) -> bytes:
    """Test-side PNG filterer (spec §6 forward direction) so the
    decoder's un-filter path is checked against an independent
    implementation, not its own inverse."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = filter_types[y % len(filter_types)]
        cur = flat[y]
        enc = np.empty(stride, np.int32)
        for i in range(stride):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (int(cur[i]) - pred) & 0xFF
        out.append(ft)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def test_png_decode_reverses_every_filter_type():
    from rxtls_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        png_decode,
    )

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(10, 9, 3)).astype(np.uint8)
    # cycle through all five filter types across scanlines
    raw = _filter_scanlines(arr, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 9, 10, 8, 2, 0, 0, 0)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(png), arr)


def test_png_decode_rejects_corruption():
    from rxtls_spark.operators.multimodal import png_decode, png_encode

    good = png_encode(np.zeros((4, 4, 1), np.uint8))
    with pytest.raises(ValueError):
        png_decode(b"NOT A PNG AT ALL")
    # flip a byte inside the IDAT payload → CRC must catch it
    bad = bytearray(good)
    bad[len(good) - 20] ^= 0xFF
    with pytest.raises(ValueError):
        png_decode(bytes(bad))
    # truncated file
    with pytest.raises(ValueError):
        png_decode(good[: len(good) - 15])


def test_media_payload_images_are_valid_pngs():
    from rxtls_spark.operators.multimodal import media_payload, png_decode

    for doc_id in range(0, 90, 3):  # kind 0 = image
        arr = png_decode(media_payload(doc_id))
        h, w, ch = arr.shape
        assert w == 16 + doc_id % 48
        assert h == 16 + doc_id % 32
        assert ch == 1 + doc_id % 3
        # pixel content is the seeded rng stream — spot-check determinism
        rng = np.random.RandomState(doc_id % (2**31))
        exp = rng.randint(0, 256, size=(h, w, ch), dtype=np.int64).astype(np.uint8)
        assert np.array_equal(arr, exp)


def test_apng_roundtrip():
    """APNG encode→decode round-trips fps and every frame exactly, for
    every channel count."""
    from rxtls_spark.operators.multimodal import apng_decode, apng_encode

    rng = np.random.RandomState(11)
    for ch in (1, 2, 3, 4):
        frames = [
            rng.randint(0, 256, size=(9, 13, ch)).astype(np.uint8)
            for _ in range(5)
        ]
        fps, got = apng_decode(apng_encode(frames, fps=12))
        assert fps == 12
        assert len(got) == 5
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)


def test_apng_rejects_corruption_and_still_png():
    from rxtls_spark.operators.multimodal import (
        apng_decode,
        apng_encode,
        is_apng,
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(5)
    frames = [
        rng.randint(0, 256, size=(6, 7, 3)).astype(np.uint8) for _ in range(3)
    ]
    good = apng_encode(frames, fps=10)
    assert is_apng(good)
    still = png_encode(frames[0])
    assert not is_apng(still)
    # a still PNG is not an APNG, an APNG is not a still PNG — neither
    # decoder silently accepts the other's stream
    with pytest.raises(ValueError):
        apng_decode(still)
    with pytest.raises(ValueError):
        png_decode(good)
    # CRC flip inside a frame chunk
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        apng_decode(bytes(bad))
    # truncation
    with pytest.raises((ValueError, zlib.error)):
        apng_decode(good[: len(good) - 20])


def test_apng_rejects_sequence_gap():
    """Sequence numbers must be consecutive (the spec contract a
    frame-dropping writer would violate)."""
    from rxtls_spark.operators.multimodal import (
        _png_chunk,
        apng_decode,
        apng_encode,
    )

    rng = np.random.RandomState(6)
    frames = [
        rng.randint(0, 256, size=(5, 5, 1)).astype(np.uint8) for _ in range(3)
    ]
    good = apng_encode(frames, fps=10)
    # bump the last fdAT's sequence number (rebuild with valid CRC)
    idx = good.rfind(b"fdAT")
    ln = struct.unpack(">I", good[idx - 4 : idx])[0]
    data = bytearray(good[idx + 4 : idx + 4 + ln])
    seq = struct.unpack(">I", bytes(data[:4]))[0]
    data[:4] = struct.pack(">I", seq + 7)
    rebuilt = (
        good[: idx - 4] + _png_chunk(b"fdAT", bytes(data))
        + good[idx + 8 + ln :]
    )
    with pytest.raises(ValueError, match="sequence"):
        apng_decode(rebuilt)


def test_media_payload_videos_are_valid_apngs():
    from rxtls_spark.operators.multimodal import (
        apng_decode,
        media_payload,
        video_n_frames,
    )

    for doc_id in range(2, 92, 3):  # kind 2 = video
        fps, frames = apng_decode(media_payload(doc_id))
        assert fps == 8 + doc_id % 23
        assert len(frames) == video_n_frames(doc_id) == 2 + doc_id % 6
        h, w, ch = frames[0].shape
        assert w == 16 + doc_id % 48
        assert h == 16 + doc_id % 32
        assert ch == 1 + doc_id % 3
        # frame pixels are the seeded rng stream, in order
        rng = np.random.RandomState(doc_id % (2**31))
        for fr in frames:
            exp = rng.randint(0, 256, size=(h, w, ch), dtype=np.int64).astype(
                np.uint8
            )
            assert np.array_equal(fr, exp)


def test_wav_roundtrip():
    """WAV encode→decode round-trips rate/channels/samples exactly,
    and malformed WAV input raises rather than mis-decoding."""
    import wave

    from rxtls_spark.operators.multimodal import wav_decode, wav_encode

    rng = np.random.RandomState(7)
    samples = rng.randint(-32768, 32768, size=300, dtype=np.int64).astype(
        np.int16
    )
    payload = wav_encode(4400, 3, samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, ch, n_frames, got = wav_decode(payload)
    assert (rate, ch, n_frames) == (4400, 3, 100)
    assert np.array_equal(got, samples)
    with pytest.raises((wave.Error, EOFError, ValueError)):
        wav_decode(b"RIFF1234WAVEgarbage")
    with pytest.raises((wave.Error, EOFError, ValueError)):
        wav_decode(payload[:30])


def test_media_payload_audio_is_valid_wav():
    from rxtls_spark.operators.multimodal import media_payload, wav_decode

    for doc_id in range(1, 91, 3):  # kind 1 = audio
        rate, ch, n_frames, samples = wav_decode(media_payload(doc_id))
        assert rate == (16 + doc_id % 48) * 100
        assert ch == 1 + doc_id % 3
        assert n_frames == 256 + doc_id % 1024
        rng = np.random.RandomState(doc_id % (2**31))
        exp = rng.randint(
            -32768, 32768, size=n_frames * ch, dtype=np.int64
        ).astype(np.int16)
        assert np.array_equal(samples, exp)


# ---------------------------------------------------------------------------
# Spark-side decode / frames / resize
# ---------------------------------------------------------------------------

def test_media_kinds(spark, media):
    counts = {r["kind"]: r["n"] for r in media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}


def test_decode_matches_header(spark, media):
    from rxtls_spark.operators.multimodal import decode_media

    dec = {r["doc_id"]: r for r in decode_media(media).collect()}
    # no stub rows anywhere: all three kinds decode for real
    assert {r["decode_ok"] for r in dec.values()} == {"real"}
    for doc_id in list(dec)[:60]:
        r = dec[doc_id]
        assert r["width"] == 16 + doc_id % 48  # audio: sample_rate/100
        if r["kind"] == "image":
            assert r["height"] == 16 + doc_id % 32
            assert r["channels"] == 1 + doc_id % 3
            exp = r["width"] * r["height"] * (1 + doc_id % 3)
        elif r["kind"] == "audio":
            assert r["height"] == 256 + doc_id % 1024  # n_frames
            assert r["channels"] == 1 + doc_id % 3
            exp = (256 + doc_id % 1024) * (1 + doc_id % 3) * 2
        else:  # video: all decoded frames' pixel bytes
            assert r["height"] == 16 + doc_id % 32
            assert r["channels"] == 1 + doc_id % 3
            exp = (
                (2 + doc_id % 6)
                * r["width"] * r["height"] * (1 + doc_id % 3)
            )
        assert r["body_bytes"] == exp, doc_id


def test_decode_mean_is_real_pixel_mean(spark, media):
    from rxtls_spark.operators.multimodal import (
        decode_media,
        media_payload,
        png_decode,
    )

    rows = decode_media(media.where(F.col("kind") == "image")).collect()
    assert rows
    for r in rows[:20]:
        arr = png_decode(media_payload(r["doc_id"]))
        assert r["mean_value"] == round(float(arr.mean()), 5)


def test_frame_sampling_emits_real_stills(spark, media):
    """sample_frames keeps every 4th REAL decoded frame and re-encodes
    it as a standalone still PNG whose pixels equal the source video's
    frame at that index."""
    from rxtls_spark.operators.multimodal import (
        apng_decode,
        png_decode,
        sample_frames,
        video_n_frames,
    )

    frames = sample_frames(media, every=4)
    agg = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert agg
    for r in agg:
        assert r["n"] == (video_n_frames(r["doc_id"]) + 3) // 4, r["doc_id"]

    from rxtls_spark.operators.multimodal import media_payload

    sample = frames.orderBy("doc_id", "frame_idx").limit(12).collect()
    for r in sample:
        _fps, decoded = apng_decode(media_payload(r["doc_id"]))
        got = png_decode(bytes(r["frame"]))
        assert np.array_equal(got, decoded[r["frame_idx"]])


def test_resize_uses_decoded_pixels(spark, media):
    from rxtls_spark.operators.multimodal import (
        media_payload,
        png_decode,
        resize_media,
    )

    rows = resize_media(media, box=32).collect()
    assert rows
    for r in rows[:15]:
        img = png_decode(media_payload(r["doc_id"]))
        h, w, ch = img.shape
        assert (r["w"], r["h"]) == (w, h)
        assert r["out_bytes"] == r["out_w"] * r["out_h"] * ch
        yi = np.arange(r["out_h"]) * h // r["out_h"]
        xi = np.arange(r["out_w"]) * w // r["out_w"]
        assert bytes(r["pixels"]) == img[yi][:, xi].tobytes()


def test_malformed_payload_quarantined(spark):
    from rxtls_spark.operators.multimodal import decode_media, png_encode

    corrupt_png = bytearray(png_encode(np.zeros((4, 4, 1), np.uint8)))
    corrupt_png[-16] ^= 0xFF
    bad = spark.createDataFrame(
        [
            (1, "image", b"NOT A CONTAINER"),
            (2, "image", b""),
            (3, "image", bytes(corrupt_png)),
        ],
        "doc_id long, kind string, payload binary",
    )
    rows = decode_media(bad).collect()
    assert all(r["decode_ok"] == "malformed" for r in rows)
    assert all(r["width"] is None for r in rows)


def test_ahash_replica_and_perceptual_contracts():
    """ahash_halves must equal a from-first-principles Python replica
    on generated images; the halves must fit 32 bits (the
    hamming_codes sign-bit discipline); a brightness-shifted copy must
    land within a small Hamming radius (the perceptual property exact
    md5 lacks); an unrelated image must land far away."""
    import numpy as np

    from rxtls_spark.operators.multimodal import (
        PHASH_GRID,
        ahash_halves,
        media_payload,
        png_decode,
    )

    def replica(img):
        h, w, _ = img.shape
        g = img.astype(np.int64).sum(axis=2)
        s = np.zeros((PHASH_GRID, PHASH_GRID), dtype=np.int64)
        for i in range(PHASH_GRID):
            for j in range(PHASH_GRID):
                s[i, j] = g[i * h // PHASH_GRID, j * w // PHASH_GRID]
        b = np.zeros((8, 8), dtype=np.int64)
        for i in range(8):
            for j in range(8):
                b[i, j] = (
                    s[2 * i, 2 * j]
                    + s[2 * i, 2 * j + 1]
                    + s[2 * i + 1, 2 * j]
                    + s[2 * i + 1, 2 * j + 1]
                )
        total = int(b.sum())
        bits = [int(int(x) * 64 > total) for x in b.flatten()]
        hi = lo = 0
        for i in range(32):
            hi = (hi << 1) | bits[i]
            lo = (lo << 1) | bits[32 + i]
        return hi, lo

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    for d in (0, 3, 6, 21, 63, 300):
        img = png_decode(media_payload(d))
        got = ahash_halves(img)
        assert got == replica(img)
        assert 0 <= got[0] < (1 << 32) and 0 <= got[1] < (1 << 32)
        # brightness shift: +8 with saturation — a classic near-dup
        shifted = np.minimum(img.astype(np.int64) + 8, 255).astype(
            np.uint8
        )
        assert ham(got, ahash_halves(shifted)) <= 12
    a = ahash_halves(png_decode(media_payload(0)))
    b = ahash_halves(png_decode(media_payload(6)))
    assert ham(a, b) >= 16  # unrelated random images: ~32 expected


def test_media_phash_groups_match_canon_formula(spark):
    """Spark rows must equal the canon-formula replica exactly (the
    oracle's premise): hash groups == PHASH_DUP_MOD/OFF payload-reuse
    groups, every injected pair collapses to its source, and NO two
    distinct images collide in the 64-bit hash on the fixed corpus."""
    from collections import Counter

    from rxtls_spark.operators.multimodal import (
        PHASH_DUP_MOD,
        PHASH_DUP_OFF,
    )
    from rxtls_spark.queries_training import q_media_phash
    from tests.conftest import SF_SMOKE

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .where("doc_id % 3 = 0")
        .collect()
    ]
    canon = Counter(
        d - PHASH_DUP_OFF if d % PHASH_DUP_MOD == PHASH_DUP_OFF else d
        for d in ids
    )
    want = sorted(
        (min(d for d in ids
             if (d - PHASH_DUP_OFF
                 if d % PHASH_DUP_MOD == PHASH_DUP_OFF else d) == c), n)
        for c, n in canon.items()
    )
    got = sorted(
        (r["rep_id"], r["n_dups"])
        for r in q_media_phash(spark, SF_SMOKE).collect()
    )
    assert got == want and got
    # the injected pairs really exist and really collapse
    dups = [(r, n) for r, n in got if n == 2]
    assert dups
    assert all(r % PHASH_DUP_MOD == 0 for r, _ in dups)
    # no accidental collisions: group count == canon count
    assert len(got) == len(canon)


def test_audio_features_match_independent_riff_parse(spark):
    """The audio features re-derived from a MANUAL RIFF/WAVE byte
    parse (struct over the fmt/data chunks — independent of both the
    wave module and wav_decode) on every audio payload: exact
    integer equality for sr/ch/n_frames/sum_sq/zcr, one row per
    audio doc, zcr < n_samples, and the random PCM sanity that zcr
    sits near half the per-channel transitions (random signs cross
    ~half the time)."""
    import struct

    import numpy as np

    from rxtls_spark.operators.multimodal import media_payload
    from rxtls_spark.queries_training import q_media_audio_features
    from tests.conftest import SF_SMOKE

    got = {
        r["doc_id"]: r for r in q_media_audio_features(spark, SF_SMOKE).collect()
    }
    doc_ids = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    audio_ids = [r["doc_id"] for r in doc_ids if r["doc_id"] % 3 == 1]
    assert set(got) == set(audio_ids)
    for d in audio_ids:
        raw = media_payload(d)
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(raw):
            tag, sz = raw[pos : pos + 4], struct.unpack(
                "<I", raw[pos + 4 : pos + 8]
            )[0]
            body = raw[pos + 8 : pos + 8 + sz]
            if tag == b"fmt ":
                fmt = body
            elif tag == b"data":
                data = body
            pos += 8 + sz + (sz & 1)
        ch, sr = struct.unpack("<HI", fmt[2:8])
        width = struct.unpack("<H", fmt[14:16])[0] // 8
        assert width == 2
        arr = np.frombuffer(data, dtype="<i2").astype(np.int64)
        nf = len(arr) // ch
        a2 = arr.reshape(nf, ch)
        sum_sq = int((arr * arr).sum())
        zcr = int(((a2[1:] * a2[:-1]) < 0).sum())
        r = got[d]
        assert (r["sr"], r["ch"], r["n_frames"]) == (sr, ch, nf)
        assert (r["sum_sq"], r["zcr"]) == (sum_sq, zcr)
        trans = (nf - 1) * ch
        assert 0 < r["zcr"] < trans
        assert abs(r["zcr"] - trans / 2) < 0.2 * trans
