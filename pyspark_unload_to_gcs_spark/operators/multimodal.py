"""Multimodal column plumbing (SURVEY.md §2l).

Images/audio/video are carried as opaque ``binary`` payload columns plus
a typed metadata struct. The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` partitioned decode, feature schemas — is real and
tested; the actual media decode is STUBBED (this container has no
image/audio libraries): ``decode_media`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder
(byte-histogram "features", length-derived "dimensions") exercises the
full pipeline.

At 100 TB: payloads stay in executor memory only one Arrow batch at a
time (``mapInPandas`` is streaming per-partition); metadata-only queries
never touch the payload column thanks to parquet column pruning — keep
payloads and metadata in the same table but NEVER select the payload
unless decoding.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png, wav, mp4, ...
        StructField("byte_length", LongType()),
        StructField("width", IntegerType()),  # -1 when unknown/not applicable
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", StringType()),  # feature fingerprint
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_payload(
    df: DataFrame, source_column: str, *, media_type: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Build a (payload, media_meta) pair from a source column —
    deterministic fake payload = UTF-8 bytes of the source column, so
    pipelines are testable without real media files."""
    payload = F.encode(F.col(source_column), "UTF-8").cast(BinaryType())
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.octet_length(payload).cast("long").alias("byte_length"),
        F.lit(-1).cast("int").alias("width"),
        F.lit(-1).cast("int").alias("height"),
        F.lit(-1).cast("long").alias("duration_ms"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_media(
    df: DataFrame,
    *,
    id_column: str = "doc_id",
    payload_column: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Decode payloads to features via ``mapInPandas`` (streaming Arrow
    batches per partition — constant memory regardless of table size).

    ``fake=False`` raises NotImplementedError at plan-build time: real
    decoders (PIL/librosa/ffmpeg) are not in this environment. The fake
    decoder is deterministic: feature = hex of a byte-histogram digest,
    width/height derived from payload length.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )

    id_col = id_column
    payload_col = payload_column

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            ids = pdf[id_col]
            rows = []
            for i, raw in zip(ids, payloads):
                b = bytes(raw) if raw is not None else b""
                digest = hashlib.blake2b(b, digest_size=16).hexdigest()
                n = len(b)
                rows.append(
                    {
                        "doc_id": int(i),
                        "media_type": "image",
                        "feature": digest,
                        "n_bytes": n,
                        "width": int(n % 1024),
                        "height": int(n // 1024),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(id_column, payload_column).mapInPandas(_decode, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    width: int,
    height: int,
    id_column: str = "doc_id",
    payload_column: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` (streaming Arrow
    batches, constant memory). Real resize (PIL) is STUBBED — not in
    this environment; ``fake=True`` emits a deterministic truncated/
    padded byte payload of width*height bytes so partitioning, schema
    and batch shape are exercised for real."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv, not present in this environment; "
            "pass fake=True for the deterministic test resizer"
        )
    target = width * height

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_column], pdf[payload_column]):
                b = bytes(raw) if raw is not None else b""
                resized = (b * (target // max(len(b), 1) + 1))[:target] if b else b"\x00" * target
                rows.append(
                    {"doc_id": int(i), "payload": resized, "width": width, "height": height}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_column, payload_column).mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    *,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_column: str = "doc_id",
    payload_column: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Sample "frames" from a video payload via ``mapInPandas`` — a
    1->N exploding transform (one input row yields up to ``max_frames``
    frame rows). Real frame extraction (ffmpeg) is STUBBED; ``fake=True``
    slices the payload every ``every_n_bytes`` so the fan-out shape,
    schema and batch behavior are real."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires ffmpeg bindings, not present in this "
            "environment; pass fake=True for the deterministic test sampler"
        )

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_column], pdf[payload_column]):
                b = bytes(raw) if raw is not None else b""
                for k in range(min(max_frames, max(len(b) // every_n_bytes, 1) if b else 0)):
                    rows.append(
                        {
                            "doc_id": int(i),
                            "frame_index": k,
                            "frame_payload": b[k * every_n_bytes : (k + 1) * every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_column, payload_column).mapInPandas(_frames, FRAME_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the payload column, so the
    parquet scan prunes it (verify with .explain: ReadSchema excludes
    payload)."""
    return df.groupBy(F.col("media_meta.media_type").alias("media_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("media_meta.byte_length").alias("total_bytes"),
        F.max("media_meta.byte_length").alias("max_bytes"),
    )


EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_media(
    df: DataFrame,
    *,
    id_column: str = "doc_id",
    payload_column: str = "payload",
    dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Media -> embedding extraction over ``mapInPandas`` (the encoder
    stage of a multimodal retrieval/dedup pipeline; output plugs
    straight into operators/similarity.py cosine_topk /
    embedding_near_dedup).

    A real encoder (CLIP-style vision tower) is STUBBED — no model
    runtimes in this environment; ``fake=False`` raises. The fake
    encoder is a deterministic L2-normalized byte histogram folded to
    ``dim`` buckets, which preserves the property tests need: identical
    payloads embed identically, near-identical payloads embed nearby.

    Batch shape matters at scale: histogramming is numpy-vectorized per
    Arrow batch (no per-row Python in the inner loop beyond the byte
    view), and only (id, payload) ship to Python — Catalyst prunes all
    other columns from the scan.
    """
    if not fake:
        raise NotImplementedError(
            "media embedding requires a model runtime not present in this "
            "environment; pass fake=True for the deterministic test encoder"
        )

    id_col, payload_col, d = id_column, payload_column, dim

    def _embed(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_ids, out_vecs = [], []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(raw) if raw is not None else b"", dtype=np.uint8)
                hist = np.bincount(b % d, minlength=d).astype(np.float32) if b.size else np.zeros(d, np.float32)
                norm = float(np.linalg.norm(hist))
                vec = (hist / norm) if norm > 0 else hist
                out_ids.append(int(i))
                out_vecs.append(vec.tolist())
            yield pd.DataFrame({"doc_id": out_ids, "embedding": out_vecs})

    return df.select(id_column, payload_column).mapInPandas(_embed, EMBED_SCHEMA)
