"""Multimodal columns: opaque binary payloads + typed metadata.

Driver mandate: treat image/audio/video as `binary` columns; implement
decode / feature-extract / resize / frame-sample as Arrow-batched UDFs
over mapInPandas.  The actual codec step is STUBBED (no image/audio
libs in this container): `decode_image` tries Pillow and falls back to
a deterministic fake decoder over a self-describing synthetic header —
the Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested.

Synthetic media payload layout (deterministic per doc_id):
  bytes 0-3   : magic b"MCK0"
  byte  4     : kind (0=image, 1=audio, 2=video)
  bytes 5-6   : uint16 BE width   (image/video) | sample-rate/100 (audio)
  bytes 7-8   : uint16 BE height  (image/video) | channels (audio)
  byte  9     : channels (image) | fps (video)
  bytes 10..  : payload body (pseudo-pixels/samples; xxh3-seeded)
"""

from __future__ import annotations

import struct
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

MAGIC = b"MCK0"
KINDS = ["image", "audio", "video"]


def media_payload(doc_id: int) -> bytes:
    kind = doc_id % 3
    w = 16 + (doc_id % 48)
    h = 16 + (doc_id % 32)
    ch = 1 + (doc_id % 3)
    body_len = (w * h * ch) % 4096 if kind == 0 else 256 + (doc_id % 1024)
    rng = np.random.RandomState(doc_id % (2**31))
    body = rng.randint(0, 256, size=body_len, dtype=np.int64).astype(np.uint8)
    return (
        MAGIC
        + bytes([kind])
        + struct.pack(">H", w)
        + struct.pack(">H", h)
        + bytes([ch])
        + body.tobytes()
    )


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
    """Real codec path — requires Pillow, absent in this container.

    When the libs exist this decodes actual image bytes; the stub below
    handles the synthetic container format either way.
    """
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        return {
            "width": img.width,
            "height": img.height,
            "channels": arr.shape[2] if arr.ndim == 3 else 1,
            "body_bytes": arr.nbytes,
            "mean_value": float(arr.mean()),
            "decode_ok": "real",
        }
    except ImportError:
        return None
    except Exception:
        return None


def _decode_fake(payload: bytes) -> dict:
    """Deterministic fake decode of the synthetic container."""
    if len(payload) < 10 or payload[:4] != MAGIC:
        return {
            "width": None, "height": None, "channels": None,
            "body_bytes": None, "mean_value": None, "decode_ok": "malformed",
        }
    w = struct.unpack_from(">H", payload, 5)[0]
    h = struct.unpack_from(">H", payload, 7)[0]
    ch = payload[9]
    body = np.frombuffer(payload, dtype=np.uint8, offset=10)
    return {
        "width": int(w),
        "height": int(h),
        "channels": int(ch),
        "body_bytes": int(body.size),
        "mean_value": round(float(body.mean()) if body.size else 0.0, 5),
        "decode_ok": "stub",
    }


def decode_media(media: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                rec = _decode_real(payload) or _decode_fake(payload)
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


def sample_frames(media: DataFrame, every: int = 4, frame_size: int = 64) -> DataFrame:
    """Frame-sampling for 'video' payloads: 1→N expansion inside
    mapInPandas (the UDTF shape), body split into fixed-size frames,
    keep every k-th."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                body = bytes(payload)[10:]
                n = len(body) // frame_size
                for i in range(0, n, every):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(body[i * frame_size : (i + 1) * frame_size])
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
    """Aspect-fit resize of 'image' payloads into a box×box bound —
    real numpy nearest-neighbor index plumbing over the (stubbed)
    decoded pixel buffer; output dims are pure integer arithmetic on
    (w, h), so the driver oracle can predict them even though the codec
    is a fake.  With a real decoder only `_decode_fake` changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                rec = _decode_fake(bytes(payload))
                if rec["decode_ok"] != "stub":
                    continue
                w, h, ch = rec["width"], rec["height"], rec["channels"]
                scale = min(box / w, box / h)
                ow = max(1, int(w * scale))
                oh = max(1, int(h * scale))
                body = np.frombuffer(bytes(payload), np.uint8, offset=10)
                px = body[: w * h * ch]
                if px.size < w * h * ch:  # short body: pad like a decoder would
                    px = np.pad(px, (0, w * h * ch - px.size))
                img = px.reshape(h, w, ch)
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
