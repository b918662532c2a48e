"""Event-time windowed aggregations with watermarked late-data handling.

The reference has no event-time concept (arrival order only — SURVEY.md
§2.5); the distributed engine needs one for its operational surface:
per-window change-rate metrics that tolerate stragglers.  Built entirely
from Structured Streaming primitives: ``withWatermark`` bounds state,
``window()`` assigns event-time buckets, append mode emits a window only
once its watermark passes — the standard late-data contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_op_counts(
    stream: DataFrame,
    ts_col: str = "event_ts",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per-window per-op event counts over an event-time column.

    Works on both streaming and batch DataFrames (batch ignores the
    watermark — useful for backfills over the same code path).  State is
    bounded: windows older than ``watermark_delay`` are finalized and
    dropped from the store; events arriving later than that are discarded
    (the lake merge path, by contrast, still accepts them via the
    ordering guard — metrics tolerate loss, state must not).
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col("op"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n",
        )
    )


def session_window_stats(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    gap: str = "10 minutes",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per-key gap sessions via Spark's native ``session_window``.

    Streaming: watermarked, so a session finalizes (append mode) once the
    watermark passes its close — bounded state, the standard late-data
    contract.  Batch: same expression, useful for backfill; the
    deterministic replay twin is ``operators.sessions.session_stats``
    (explicit lag+sum construction with a SQL oracle).
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
