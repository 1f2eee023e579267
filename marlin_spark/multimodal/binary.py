"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (task spec): payloads travel as `binary` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched functions over mapInPandas. The image/audio codecs are
NOT in this container, so the decode step is STUBBED — `decode_image`
raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decode (derived from the bytes) exercises the full
Spark plumbing: schema, partitioning, batch shapes, metadata extraction.

At 100 TB the operative concerns are all here and real:
- binary column + metadata struct schema (no per-row Python objects),
- mapInPandas so each Arrow batch is one vectorized call,
- repartition by size bucket before decode so skewed payload sizes
  don't produce straggler tasks,
- column pruning: metadata-only queries never read payload bytes.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("checksum", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum string, "
    "feat array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real impl would use PIL/libjpeg (absent in this container).

    fake=True returns a deterministic pseudo-image (8x8x3 uint8 derived
    from the payload digest) so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True for the deterministic test decode"
        )
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3).copy()


def wrap_text_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table: utf-8 bytes stand in for payloads
    (the container has no real image fixtures)."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def with_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata struct — pure Catalyst, payload column prunable."""
    n = F.octet_length("payload")
    return media.withColumn(
        "meta",
        F.struct(
            n.cast("int").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("checksum"),
            F.when(F.col("kind") == "image", (64 + n % 512).cast("int")).alias("width"),
            F.when(F.col("kind") == "image", (64 + (n * 7) % 512).cast("int")).alias("height"),
            F.when(F.col("kind") != "image", (n * 13 % 60000).cast("int")).alias("duration_ms"),
        ),
    )


def extract_features(media: DataFrame, size_buckets: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    Repartitions by size bucket first (decode cost ~ payload size, so
    hashing by size bucket evens out task durations — the multimodal
    skew analog of term salting)."""
    bucketed = media.withColumn(
        "_sb", (F.octet_length("payload") % size_buckets).cast("int")
    ).repartition("_sb")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, sums = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                img = decode_image(b, fake=True)  # stubbed decode
                # "feature": per-channel means + crc-derived hash feature
                f = img.reshape(-1, 3).mean(axis=0) / 255.0
                h = (zlib.crc32(b) % 1000) / 1000.0
                feats.append(np.append(f, h).astype(np.float32))
                nbytes.append(len(b))
                sums.append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "checksum": sums,
                    "feat": feats,
                }
            )

    return bucketed.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video payloads: one row per planned frame
    (the decode itself is the stubbed step). Shows the explode pattern
    that turns one video row into N frame tasks without per-row Python."""
    v = media.filter(F.col("kind") == "video").withColumn(
        "duration_ms", F.col("meta.duration_ms")
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
