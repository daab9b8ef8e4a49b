"""Multimodal (binary) column plumbing.

Pattern for image/audio/video at 100 TB: media as opaque ``binary``
columns with a typed metadata struct, processed by Arrow-batched
``mapInPandas`` stages so decode/resize/frame-sample run vectorised
per-partition without ever materialising media on the driver.

The decode itself is STUBBED: this container has no image/audio codecs,
so ``decode_batch`` computes deterministic fake features from the bytes
(documented below). The Spark-side contract — schema, batch iteration,
partition independence, output arity — is real and tested; a real
deployment swaps `_fake_decode` for PIL/ffmpeg calls and nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

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

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_frames_sampled", IntegerType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Give documents an opaque binary payload + typed metadata.

    (Real pipelines read the bytes from object storage; here the utf-8
    text bytes stand in so the pipeline is runnable on the testdata.)
    """
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.length(F.col("text")).alias("declared_size"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, float, int]:
    """Deterministic stand-in for a codec: derives "dimensions", a mean
    byte value, and a frame-sample count from the raw bytes. A real
    deployment replaces this one function with PIL/ffmpeg."""
    n = len(payload)
    width = 16 + (payload[0] % 64) if n else 0
    height = 16 + (payload[-1] % 64) if n else 0
    mean_byte = sum(payload[:256]) / min(n, 256) if n else 0.0
    n_frames = 1 if media_type == "image" else 1 + n % 7
    return width, height, mean_byte, n_frames


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [
            _fake_decode(payload, meta["media_type"])
            for payload, meta in zip(pdf["payload"], pdf["media_meta"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": [m["media_type"] for m in pdf["media_meta"]],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "fake_width": [f[0] for f in feats],
                "fake_height": [f[1] for f in feats],
                "mean_byte": [round(f[2], 4) for f in feats],
                "n_frames_sampled": [f[3] for f in feats],
            }
        )


def decode_media(docs: DataFrame) -> DataFrame:
    """documents → media features via the Arrow-batched decode stage."""
    return attach_media(docs).mapInPandas(decode_batch, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes_out", LongType()),
    ]
)

TARGET_BYTES = 64  # stand-in for a (width, height) resize target


def _fake_resize(payload: bytes, media_type: str, use_real_codec: bool = False) -> bytes:
    """Binary-in/binary-out transform stand-in.

    A real deployment decodes, resizes to the target box and re-encodes
    (PIL for image, ffmpeg scale filter for video); that path is gated
    behind ``use_real_codec`` and raises until a codec is installed.
    The stub keeps the transform deterministic and size-bounded — a
    prefix truncation — so the Spark contract (binary column in, binary
    column out, bounded output size) is fully testable.
    """
    if use_real_codec:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "swap _fake_resize for a PIL/ffmpeg implementation"
        )
    return payload[:TARGET_BYTES]


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: re-emits the binary payload resized.

    Binary stays inside the Arrow batches end-to-end — no driver
    round-trip, no row-at-a-time Python, and each partition is
    independent so the stage scales with executors.
    """
    for pdf in batches:
        resized = [
            _fake_resize(p, m["media_type"])
            for p, m in zip(pdf["payload"], pdf["media_meta"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": [m["media_type"] for m in pdf["media_meta"]],
                "payload": resized,
                "n_bytes_out": [len(p) for p in resized],
            }
        )


def resize_media(docs: DataFrame) -> DataFrame:
    """documents → resized binary payloads (Arrow-batched, partition-
    parallel). Compose after attach_media, before/after decode_media —
    each stage is an independent mapInPandas pass over binary columns."""
    return attach_media(docs).mapInPandas(resize_batch, schema=RESIZED_SCHEMA)


def sample_frames(docs: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index.

    The frame count comes from the (stubbed) decode stage; the
    explosion to per-frame rows is pure Spark (posexplode over a
    sequence) so the real codec only ever supplies counts and bytes.
    Downstream per-frame feature extraction then parallelises over
    frames, not videos — the skew fix for long-video corpora.
    """
    decoded = decode_media(docs)
    return decoded.where(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames_sampled") - 1, F.lit(0)),
                F.lit(every_nth),
            )
        ).alias("frame_idx"),
    )


def fingerprint_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 64-bit content fingerprint per media blob —
    the pHash slot, carried as two positive 32-bit halves (sign-safe
    band arithmetic in both Spark and DuckDB). The stand-in hashes the
    raw bytes (md5 prefix, so the oracle can mirror it SQL-side); a
    real deployment computes a perceptual hash from decoded
    pixels/frames in this same kernel and the banding pipeline
    downstream is unchanged. Fingerprint WIDTH is the dedup scale
    knob: with hamming<=3 the pigeonhole band count is fixed at 4, so
    per-band bucket occupancy is n / 2^(width/4) — 8-bit bands
    saturated at the 16x replica stress (b~1.3); 16-bit bands hold
    occupancy ~1 up to corpora of ~10^7 blobs, and a production
    256-bit pHash pushes that out of sight."""
    import hashlib

    for pdf in batches:
        hexes = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": [m["media_type"] for m in pdf["media_meta"]],
                "phash": [int(h[:8], 16) for h in hexes],
                "phash_lo": [int(h[8:16], 16) for h in hexes],
            }
        )


def fingerprint_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, 64-bit fingerprint as two
    positive 32-bit halves ``phash`` / ``phash_lo``)."""
    media = attach_media(docs)
    return media.mapInPandas(
        fingerprint_batch,
        schema="doc_id long, media_type string, phash long, phash_lo long",
    )
