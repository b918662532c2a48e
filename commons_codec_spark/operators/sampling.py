"""Deterministic sampling for training-data curation.

``df.sample()`` is nondeterministic across retries/partitionings —
useless for reproducible corpus construction.  These samplers decide
membership from a *hash of the row's id*, so the same (seed, id) is in
or out forever, on any cluster size, under any retry: a pure filter with
no shuffle and no state, which also means resampling at a larger
fraction is a superset (fraction monotonicity — grow a corpus without
re-decoding the old one).

Two hash forms:

* :func:`uniform_from_id` — Knuth multiplicative hash on a numeric id;
  overflow-safe 64-bit arithmetic (split 16-bit multiply), expressible
  identically in any engine (the DuckDB oracle states the same formula).
* :func:`uniform_from_text` — md5-based for string ids.

Stratified form: per-stratum fractions (e.g. keep 100% of rare
languages, 5% of English) via one CASE over the strata column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Knuth's multiplicative constant (golden-ratio scaling of 2^32).
_KNUTH = 2654435761
_M32 = 4294967296  # 2^32
#: (2654435761 * 2^16) mod 2^32 — the high-half partial product's factor.
_KNUTH_HI = (_KNUTH * 65536) % _M32


def uniform_from_id(id_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from a numeric id.

    Value: ``((id + seed) * 2654435761) mod 2^32 / 2^32``.  Computed
    overflow-safe: the id is first reduced mod 2^32 (the product only
    depends on that residue) and the 32×32-bit multiply is split into
    16-bit halves, so every intermediate stays under 2^49 — no 64-bit
    overflow for any id, under ANSI mode (Spark) or int64-checked
    engines (DuckDB).  The SQL oracle states the identical split form.
    """
    a = F.pmod(id_col.cast("long") + F.lit(int(seed)), F.lit(_M32))
    h = F.pmod(
        a.bitwiseAND(F.lit(65535)) * F.lit(_KNUTH)
        + F.shiftright(a, 16) * F.lit(_KNUTH_HI),
        F.lit(_M32),
    )
    return h.cast("double") / F.lit(float(_M32))


def uniform_from_text(text_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from a string id (md5-based)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), text_col)), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(16**8))


def sample_fraction(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by numeric id hash."""
    return df.filter(uniform_from_id(F.col(id_col), seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (one filter, no shuffle).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``.  Membership depends only on (seed, id), so
    raising any stratum's fraction yields a superset of the old sample.
    """
    frac: Column = F.lit(float(default_fraction))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(uniform_from_id(F.col(id_col), seed) < frac)


__all__ = [
    "uniform_from_id",
    "uniform_from_text",
    "sample_fraction",
    "stratified_sample",
]
