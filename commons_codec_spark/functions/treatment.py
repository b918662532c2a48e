"""Treatment ops: record-shape rewrites between decode and sink.

The reference routes documents through Tikray ``CollectionTransformation``
treatments (``/root/reference/src/commons_codec/transform/mongodb.py:48,
56-59,189-200``; observed semantics in
``/root/reference/tests/transform/mongodb/test_mongodb_convert.py:158-302``).
Two forms here:

* :class:`Treatment` — the document-level (dict) form, applied *during*
  the Extended-JSON decode exactly like the reference's
  ``apply_special_treatments`` (each dict is treated before its children
  decode — which is why ``normalize_complex_lists`` stringifies raw
  ``$date`` markers).  Plug into the Mongo decoders via
  ``MongoDecodeConfig(treatment=...)``.
* Column-expression factories (:func:`ignore_fields`,
  :func:`convert_string`, :func:`convert_list`, :func:`flatten`,
  :func:`chain`) — the DataFrame form for ``PipelineConfig.transform``:
  JVM-side, codegen, no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class Treatment:
    """Dict-level treatment, mirroring the reference's Tikray options.

    Applied to each (non-``$``-marker) dict *before* its children decode:

    * ``ignore_complex_lists`` — drop values that are lists of dicts
    * ``normalize_complex_lists`` — inside lists of dicts, stringify
      dict-typed inner values (raw, pre-decode — reference parity)
    * ``ignore_field`` — drop the named keys at any depth
    * ``convert_list`` — wrap scalars in a one-element list
    * ``convert_string`` — stringify scalars
    * ``convert_dict`` — ``{"name": k, "wrapper_name": w}``: wrap a
      non-dict value at key ``k`` as ``{w: value}``
    """

    ignore_complex_lists: bool = False
    normalize_complex_lists: bool = False
    ignore_field: list[str] = field(default_factory=list)
    convert_list: list[str] = field(default_factory=list)
    convert_string: list[str] = field(default_factory=list)
    convert_dict: list[dict] = field(default_factory=list)

    @staticmethod
    def _is_complex_list(value: Any) -> bool:
        return isinstance(value, list) and any(
            isinstance(e, dict) for e in value
        )

    def apply(self, record: dict) -> dict:
        """One dict level (children are treated when recursion reaches them)."""
        out: dict = {}
        wrap = {d["name"]: d["wrapper_name"] for d in self.convert_dict}
        for key, value in record.items():
            if key in self.ignore_field:
                continue
            if self._is_complex_list(value):
                if self.ignore_complex_lists:
                    continue
                if self.normalize_complex_lists:
                    value = [
                        {
                            ik: (str(iv) if isinstance(iv, dict) else iv)
                            for ik, iv in e.items()
                        }
                        if isinstance(e, dict)
                        else e
                        for e in value
                    ]
            if key in self.convert_list and not isinstance(value, list):
                value = [value]
            if key in self.convert_string:
                value = str(value)
            if key in wrap and not isinstance(value, dict):
                value = {wrap[key]: value}
            out[key] = value
        return out


# ---------------------------------------------------------------------------
# Column-expression factories (the PipelineConfig.transform form)
# ---------------------------------------------------------------------------


def ignore_fields(*names: str) -> Callable[[DataFrame], DataFrame]:
    """Drop the named payload columns (``ignore_field`` analog)."""

    def apply(df: DataFrame) -> DataFrame:
        return df.drop(*[n for n in names if n in df.columns])

    return apply


def convert_string(*names: str) -> Callable[[DataFrame], DataFrame]:
    """Cast the named columns to string (``convert_string`` analog)."""

    def apply(df: DataFrame) -> DataFrame:
        for n in names:
            if n in df.columns:
                df = df.withColumn(n, F.col(n).cast("string"))
        return df

    return apply


def convert_list(*names: str) -> Callable[[DataFrame], DataFrame]:
    """Wrap the named scalar columns in one-element arrays (``convert_list``)."""

    def apply(df: DataFrame) -> DataFrame:
        for n in names:
            if n in df.columns:
                df = df.withColumn(n, F.array(F.col(n)))
        return df

    return apply


def flatten(*names: str) -> Callable[[DataFrame], DataFrame]:
    """Flatten array-of-array columns one level (jq ``flatten`` analog)."""

    def apply(df: DataFrame) -> DataFrame:
        for n in names:
            if n in df.columns:
                df = df.withColumn(n, F.flatten(F.col(n)))
        return df

    return apply


def chain(*ops: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
    """Compose treatment ops left-to-right into one transform hook."""

    def apply(df: DataFrame) -> DataFrame:
        for op in ops:
            df = op(df)
        return df

    return apply
