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
