"""Gap-based sessionization over event streams.

Batch form: the classic lag + running-sum construction — one window over
``(key, ts)`` marks session starts (gap exceeded), a second running sum
assigns dense per-key session ids.  Pure window functions (JVM,
codegen), deterministic via an explicit tiebreak column, and stated in
integer microseconds so a SQL oracle reproduces it bit-for-bit.

Streaming form: :func:`commons_codec_spark.streaming.windows.
session_window_stats` uses Spark's native ``session_window`` +
watermark — bounded state, late-data-safe; the batch form here is its
deterministic replay/backfill twin.

Scale: one shuffle on the session key; a hot key costs one sort run
(window), not a buffer.  At 100 TB choose the key (user, device) so
per-key event counts stay sortable; skew-prone keys can pre-aggregate
per (key, hour) first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_sec: int = 600,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a dense per-key ``session_id`` (0-based) to every event.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_sec`` (strictly greater — an event exactly at the
    gap boundary continues the session).
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [ts_us] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(ts_us).over(w)
    new_session = F.when(
        prev.isNull() | (ts_us - prev > int(gap_sec) * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(
        "session_id", (F.sum(new_session).over(running) - 1).cast("long")
    )


def session_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_sec: int = 600,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: event count, start/end (µs), duration (µs)."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    s = sessionize(df, keys, ts_col, gap_sec, tiebreak_col)
    return s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
        (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
    )
