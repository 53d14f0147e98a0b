"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``.  The codec libraries are
not available in this container, so the *decode* step is a deterministic
header parser over a self-describing synthetic format (see
``FESB`` below), with the real-codec path stubbed behind
``NotImplementedError`` — the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested.

Synthetic payload format ("FESB", fetch-engines-spark binary):
  bytes 0-3   magic  b"FESB"
  byte  4     media kind (1=image, 2=audio, 3=video)
  bytes 5-8   width  (big-endian uint32)  [image/video]
  bytes 9-12  height (big-endian uint32)  [image/video]
  bytes 13-16 n_frames / n_samples (big-endian uint32)
  bytes 17-   opaque payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"FESB"
KINDS = {1: "image", 2: "audio", 3: "video"}

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("error", StringType()),
    ]
)

MEDIA_INPUT_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def encode_payload(kind: int, width: int, height: int, n_frames: int, body: bytes) -> bytes:
    return MAGIC + struct.pack(">BIII", kind, width, height, n_frames) + body


def decode_header(payload: bytes) -> dict:
    """Parse the FESB header. Raises ValueError on malformed payloads."""
    if payload is None or len(payload) < 17 or payload[:4] != MAGIC:
        raise ValueError("not a FESB payload")
    kind, width, height, n_frames = struct.unpack(">BIII", payload[4:17])
    if kind not in KINDS:
        raise ValueError(f"unknown media kind {kind}")
    return {
        "kind": KINDS[kind],
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "payload_bytes": len(payload),
    }


def decode_real_codec(payload: bytes) -> dict:  # pragma: no cover - stub
    """Real image/audio decode (PIL/ffmpeg) — unavailable in this container.

    STUB: wire the actual codec here when the cluster image ships one.
    """
    raise NotImplementedError("codec libraries not available in this environment")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in MEDIA_META_SCHEMA.names}
        for row in pdf.itertuples(index=False):
            payload = bytes(row.payload) if row.payload is not None else None
            meta = {"kind": None, "width": None, "height": None, "n_frames": None, "payload_bytes": None}
            err = None
            try:
                meta = decode_header(payload)
            except ValueError as exc:
                err = str(exc)
            out["media_id"].append(row.media_id)
            out["kind"].append(meta.get("kind"))
            out["width"].append(meta.get("width"))
            out["height"].append(meta.get("height"))
            out["n_frames"].append(meta.get("n_frames"))
            out["payload_bytes"].append(meta.get("payload_bytes"))
            out["error"].append(err)
        yield pd.DataFrame(out)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """media(media_id, payload:binary) → typed metadata via one
    Arrow-batched mapInPandas stage (the decode slot of the multimodal
    pipeline)."""
    return media.select("media_id", "payload").mapInPandas(
        _decode_batches, schema=MEDIA_META_SCHEMA
    )


def frame_sample_plan(media_meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan*: for video rows, the frame indices a decoder
    would extract (sequence + explode; JVM-side, no UDF).  Downstream real
    decoding consumes (media_id, frame_idx) pairs."""
    from pyspark.sql import functions as F

    vids = media_meta.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
