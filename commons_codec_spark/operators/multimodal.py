"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode libraries (Pillow, ffmpeg, torchaudio) are not in this
container, so the *codec* step is stubbed — either a clearly-marked
``NotImplementedError`` (real mode) or a deterministic fake (test mode).
Everything around the stub is real and tested: the typed schema, Arrow
batch shape, ``mapInPandas`` partition flow, and the feature/resize/
frame-sample operator signatures a real deployment would ship.

Schema convention::

    media: binary                  -- opaque payload
    media_meta: struct<mime:string, width:int, height:int,
                       duration_ms:long, sample_rate:int>

At 100 TB the binary column dominates I/O: operators select it last
(column pruning keeps metadata-only plans off the blobs), batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and each
stage emits fixed-size feature vectors rather than re-materializing
payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def _decode_image_real(payload: bytes):  # pragma: no cover - needs Pillow
    raise NotImplementedError(
        "Image decoding requires Pillow/libjpeg, not present in this "
        "environment. Swap in PIL.Image.open(io.BytesIO(payload)) on a real "
        "cluster; the surrounding Spark plumbing is unchanged."
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256-seeded vector.

    Keeps tests meaningful (stable values, right shapes) while being
    honest that no real decoding happens here.
    """
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    media_col: str = "media",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """media binary -> fixed-dim feature vector (array<float>).

    Arrow-batched mapInPandas; one Python call per batch, numpy inside.
    ``use_fake_decoder=False`` raises the NotImplementedError stub to make
    the missing-codec boundary explicit.
    """
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        list(passthrough) + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[media_col]:
                if not use_fake_decoder:
                    _decode_image_real(payload)
                feats.append(_fake_features(payload, dim).tolist())
            out = pdf.drop(columns=[media_col])
            out["features"] = feats
            yield out

    return df.mapInPandas(_map, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video -> one row per sampled frame timestamp (decode stubbed).

    Emits (frame_ts_ms, frame: binary) rows; the frame payload here is a
    deterministic slice marker, standing in for the decoded frame bytes.
    """
    passthrough = [f for f in df.schema.fields if f.name not in (media_col,)]
    out_schema = T.StructType(
        list(passthrough)
        + [
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                duration = (row[meta_col] or {}).get("duration_ms") or 0
                for ts in range(0, int(duration), every_ms):
                    out = {k: row[k] for k in pdf.columns if k != media_col}
                    out["frame_ts_ms"] = ts
                    payload = row[media_col] or b""
                    out["frame"] = hashlib.sha256(
                        payload + ts.to_bytes(8, "big")
                    ).digest()
                    rows.append(out)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: [] for f in out_schema.fields}
            )

    return df.mapInPandas(_map, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """media binary -> resized media binary + (resized_w, resized_h).

    The pixel work is the stubbed codec step (real mode:
    ``PIL.Image.open(...).resize((width, height))`` — raises the explicit
    NotImplementedError here); the stand-in emits a deterministic
    sha256-derived payload whose length scales with the target area, so
    batch shapes and downstream size accounting stay realistic.
    """
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        list(passthrough)
        + [
            T.StructField(media_col, T.BinaryType()),
            T.StructField("resized_w", T.IntegerType()),
            T.StructField("resized_h", T.IntegerType()),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_len = max((width * height) // 64, 32)
        for pdf in batches:
            out_payloads = []
            for payload in pdf[media_col]:
                if not use_fake_decoder:
                    _decode_image_real(payload)
                digest = hashlib.sha256(
                    (payload or b"") + f"{width}x{height}".encode()
                ).digest()
                reps = target_len // len(digest) + 1
                out_payloads.append((digest * reps)[:target_len])
            out = pdf.drop(columns=[media_col])
            out[media_col] = out_payloads
            out["resized_w"] = width
            out["resized_h"] = height
            yield out

    return df.mapInPandas(_map, schema=out_schema)
