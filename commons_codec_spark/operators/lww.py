"""Last-writer-wins collapse per key (SURVEY.md §2.5 — the one aggregation).

``lww_latest`` keeps, per key, the row with the greatest ordering tuple.
Implemented with ``max_by(struct(payload), struct(order))`` — a hash
aggregate with map-side partial combine, one shuffle, no window/sort.

``salted=True`` runs it as a two-phase reduce (groupBy(key, salt) then
groupBy(key)) so a pathologically hot key cannot overload one reducer —
the explicit skew handling the north rule asks for.  AQE mitigates skewed
*joins* automatically but not single-key aggregation groups; salting does.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def lww_latest(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    salted: bool = False,
    salt_buckets: int = 16,
) -> DataFrame:
    """Latest row per key by ``order_cols`` (ties broken by later cols)."""
    payload = [c for c in df.columns if c not in keys]
    best = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("__best")

    if salted:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), salt_buckets)
        partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(best)
        # phase 2: reduce the (at most salt_buckets) partials per key
        ord_in_best = F.struct(*[F.col(f"__best.{c}") for c in order_cols])
        out = partial.groupBy(*keys).agg(
            F.max_by(F.col("__best"), ord_in_best).alias("__best")
        )
    else:
        out = df.groupBy(*keys).agg(best)

    return out.select(*keys, *[F.col(f"__best.{c}").alias(c) for c in payload])
