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
    """Deterministic stand-in feature extractor: sha256-byte chain.

    Component j is byte j of sha256(payload) (re-hashing the block for
    dim > 32), mapped to ``b/256 - 0.5`` ∈ [-0.5, 0.496].  The divisor is
    a power of two, so every component is exactly representable in
    float32 — a SQL oracle (sha256 over the same bytes) reproduces the
    quantized values bit-for-bit, keeping the contract check hash-exact
    while staying honest that no real decoding happens here.
    """
    out = bytearray()
    block = hashlib.sha256(payload or b"").digest()
    out.extend(block)
    while len(out) < dim:
        block = hashlib.sha256(block).digest()
        out.extend(block)
    arr = np.frombuffer(bytes(out[:dim]), dtype=np.uint8).astype(np.float32)
    return arr / np.float32(256.0) - np.float32(0.5)


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


def frame_stub_bytes(payload: bytes, ts_ms: int) -> bytes:
    """Stand-in for a decoded video frame: sha256 over ``md5hex(payload):ts``.

    Stated over strings (hex digest + decimal timestamp) so any engine
    with string md5/sha256 — Spark, DuckDB — reproduces it exactly.
    """
    seed = hashlib.md5(payload or b"").hexdigest() + ":" + str(int(ts_ms))
    return hashlib.sha256(seed.encode()).digest()


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video -> one row per sampled frame timestamp (decode stubbed).

    ONE Python pass per *video*: a single ``mapInPandas`` stage receives
    each video's payload once and emits all of its frame rows — the shape
    a real ffmpeg/PyAV deployment uses (open the container once, seek per
    timestamp).  The earlier explode-then-UDF formulation serialized the
    full binary payload through the Arrow exchange once per frame (a
    60-frame video crossed 60×); here the payload crosses exactly once
    regardless of frame count, and only the emitted frames (fixed-size)
    multiply.  Frame timestamps are ``range(0, duration_ms, every_ms)``
    and the frame bytes are the :func:`frame_stub_bytes` stand-in at the
    clearly-marked codec boundary.
    """
    passthrough = [f for f in df.schema.fields if f.name != media_col]
    out_schema = T.StructType(
        list(passthrough)
        + [
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    keep = [f.name for f in passthrough]
    step = int(every_ms)

    def _duration(meta) -> int:
        # struct metas arrive as dicts; map metas as dicts or key/value
        # tuple lists depending on the Arrow conversion
        if meta is None:
            return 0
        if not isinstance(meta, dict):
            meta = dict(meta)
        d = meta.get("duration_ms")
        return int(d) if d is not None else 0

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in keep}
            ts_out: list[int] = []
            frames: list[bytes] = []
            metas = pdf[meta_col] if meta_col in pdf.columns else None
            for i in range(len(pdf)):
                payload = pdf[media_col].iloc[i]
                duration = _duration(metas.iloc[i]) if metas is not None else 0
                for t in range(0, duration, step):
                    for c in keep:
                        out[c].append(pdf[c].iloc[i])
                    ts_out.append(t)
                    frames.append(frame_stub_bytes(payload, t))
            res = pd.DataFrame(out, columns=keep)
            res["frame_ts_ms"] = pd.Series(ts_out, dtype="int64")
            res["frame"] = pd.Series(frames, dtype=object)
            yield res

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
