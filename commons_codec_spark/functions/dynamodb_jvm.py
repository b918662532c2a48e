"""JVM-compiled universal descriptor decode — no Python in the hot path.

:mod:`.dynamodb` ships two decode forms: the Arrow ``mapInPandas`` kernel
(:func:`~.dynamodb.decode_universal`, arbitrary schemas) and the
whole-stage-codegen DIRECT compiler (known schemas).  This module closes
the gap between them: a **JVM universal decoder** that evaluates the same
recursive S/N/B/BOOL/NULL/M/L/SS/NS/BS lattice
(``/root/reference/src/commons_codec/vendor/boto3/dynamodb/types.py:82-144``
with the CrateDB overrides of
``/root/reference/src/commons_codec/transform/dynamodb.py:28-68``) entirely
in built-in column expressions, for arbitrary, unknown-at-compile-time
record schemas.

How: a descriptor value is one-key JSON ``{marker: payload}``.
``from_json(col, "map<string,string>")`` exposes the marker as the map key
and the payload as **raw JSON text** (Spark's string catch-all), so each
lattice level is a ``when``-chain over the marker with the payload
re-parsed one level down.  ``M``/``L`` recurse by structural unrolling to
a fixed ``max_depth``; rows whose images nest deeper are flagged and
routed to the Arrow kernel (the specification), so correctness never
depends on the unroll depth — only the hot path's residency does.

**Measured honestly (local[32], 2M depth-1 images, warm): the Arrow
kernel wins — 8.5 s vs 35 s for this expression form.**  Spark evaluates
higher-order-function lambdas interpreted (no whole-stage codegen), and
every lattice level re-parses its payload through Jackson, so the
expression decoder pays ~4x the Arrow kernel's per-row cost.  It is kept
because it is the only *Python-worker-free* arbitrary-schema decode
(deployments where executors run without Python, or where Arrow transfer
is the bottleneck), and because its golden/corpus tests double as an
independent check on the kernel.  For JVM *speed* on unknown schemas use
:func:`~.dynamodb_auto.decode_auto`, which infers the batch's top-level
schema and compiles the DIRECT decoder for it.

Every repeated subexpression is ``let``-bound (:func:`..colutil.let`):
HOF lambdas have no common-subexpression elimination, so an unbound
``from_json`` re-parse per marker branch would multiply work by the
branch count.

Output-representation parity with the Arrow kernel (bucket values are
JSON-encoded text) is pinned by ``tests/test_dynamodb_jvm.py``, which
cross-checks both decoders over golden descriptors and generated corpora.
Known, documented divergences (all outside the reference's own fixture
space): Python ``repr`` vs Java ``Double.toString`` for doubles beyond
2^53 or in scientific-notation range, and malformed-producer cases such
as non-string ``S`` payloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame

from ..colutil import let
from .dynamodb import UNIVERSAL_SCHEMA, decode_universal

#: Result of decoding one descriptor: the plain-JSON text of the value,
#: the varied-L routing flag, the depth-wall flag, and the malformed flag.
_RESULT_T = "struct<json:string,varied:boolean,deep:boolean,err:boolean>"

_MAP_SS = "map<string,string>"
_ARR_S = "array<string>"


def _res(
    json: Column | None = None,
    varied: Column | bool = False,
    deep: Column | bool = False,
    err: Column | bool = False,
) -> Column:
    j = json if json is not None else F.lit(None).cast("string")
    return F.struct(
        j.alias("json"),
        (varied if isinstance(varied, Column) else F.lit(varied)).alias("varied"),
        (deep if isinstance(deep, Column) else F.lit(deep)).alias("deep"),
        (err if isinstance(err, Column) else F.lit(err)).alias("err"),
    ).cast(_RESULT_T)


def _jstr(s: Column) -> Column:
    """JSON string literal of ``s`` (Jackson escaping == json.dumps with
    ensure_ascii=False for quote/backslash/control chars).

    ``to_json(struct(s as x))`` yields ``{"x":<literal>}``; strip the
    6-char prefix and 1-char suffix.  NULL maps to the JSON ``null``.
    """
    esc = let(
        F.to_json(F.struct(s.alias("x"))),
        lambda t: t.substr(F.lit(6), F.length(t) - 6),
    )
    return F.when(s.isNull(), F.lit("null")).otherwise(esc)


def _num_json(d: Column) -> Column:
    """JSON text of a double, matching Python ``repr`` where it matters.

    Python renders integral floats as ``123.0``; Java's ``Double.toString``
    switches to scientific notation at 1e7.  Format integral magnitudes
    below 2^53 explicitly; everything else falls back to the Java form
    (documented divergence far outside the fixture space).
    """
    return F.when(
        (d == F.floor(d)) & (F.abs(d) < F.lit(9007199254740992.0)),
        F.format_string("%.1f", d),
    ).otherwise(d.cast("string"))


def _bool_json(payload: Column) -> Column:
    """Truthiness of a payload's text, mirroring Python ``bool(parsed)``.

    Scalar payloads arrive as their bare text (Jackson's string
    conversion), so false/null/empty/zero and empty containers are falsy;
    everything else is truthy.  (A malformed *string* payload ``"false"``
    is textually identical to the boolean and decodes falsy — the one
    divergence from the reference's ``bool()``, for producers already off
    the DynamoDB wire format.)
    """
    return (
        F.when(
            payload.isNull() | payload.isin("false", "null", "", "[]", "{}"),
            F.lit("false"),
        )
        .when(payload.try_cast("double") == 0.0, F.lit("false"))
        .otherwise(F.lit("true"))
    )


def _marker_of(desc: Column) -> Column:
    """First key of a descriptor's JSON object (None if not an object)."""
    return F.get(F.map_keys(F.from_json(desc, _MAP_SS)), 0)


def _join_arr(parts: Column) -> Column:
    return F.concat(F.lit("["), F.concat_ws(",", parts), F.lit("]"))


def _decode_descriptor(desc: Column, level: int) -> Column:
    """One lattice level over descriptor JSON text ``desc`` -> ``_RESULT_T``.

    ``level`` counts remaining M/L unrolls; at 0 a nested M/L sets the
    ``deep`` flag instead of recursing.

    Scalar payloads (S/N/B/BOOL/NULL) arrive as their **bare value text**
    (Jackson's string conversion unquotes JSON strings and stringifies
    numbers/booleans); only object/array payloads (M/L/SS/NS/BS) arrive
    as raw JSON.  M and L share a single recursion site (the unified
    child-descriptor array), keeping the unrolled expression tree linear
    in ``level`` instead of exponential.
    """
    if level < 0:  # pragma: no cover — guarded by the M/L branch below
        return _res(deep=True)

    def over_map(m: Column) -> Column:
        marker = F.get(F.map_keys(m), 0)
        payload = F.get(F.map_values(m), 0)

        scalar_s = F.when(payload.isNull(), _res(F.lit("null"))).otherwise(
            _res(_jstr(payload))
        )

        num = let(
            payload.try_cast("double"),
            lambda d: F.when(d.isNull(), _res(err=True)).otherwise(
                _res(_num_json(d))
            ),
        )

        str_set = let(
            F.from_json(payload, _ARR_S),
            lambda arr: F.when(arr.isNull(), _res(err=True)).otherwise(
                _res(
                    _join_arr(
                        F.transform(F.array_sort(arr), lambda x: _jstr(x))
                    )
                )
            ),
        )

        num_set = let(
            F.from_json(payload, _ARR_S),
            lambda arr: F.when(arr.isNull(), _res(err=True)).otherwise(
                let(
                    F.transform(arr, lambda x: x.try_cast("double")),
                    lambda ds: F.when(
                        F.exists(ds, lambda d: d.isNull()), _res(err=True)
                    ).otherwise(
                        _res(
                            _join_arr(
                                F.transform(
                                    F.array_sort(ds), lambda d: _num_json(d)
                                )
                            )
                        )
                    ),
                )
            ),
        )

        if level == 0:
            ml_branch = _res(deep=True)
        else:
            # ONE recursion site for both M and L: decode the unified
            # child-descriptor array, then assemble per shape.
            def over_children(inner: Column, child_descs: Column) -> Column:
                return let(
                    F.transform(
                        child_descs,
                        lambda x: _decode_descriptor(x, level - 1),
                    ),
                    lambda cs: let(
                        F.when(
                            marker == "M",
                            F.concat(
                                F.lit("{"),
                                F.concat_ws(
                                    ",",
                                    F.zip_with(
                                        F.map_keys(inner),
                                        cs,
                                        lambda k, c: F.concat(
                                            _jstr(k), F.lit(":"), c["json"]
                                        ),
                                    ),
                                ),
                                F.lit("}"),
                            ),
                        ).otherwise(
                            _join_arr(F.transform(cs, lambda c: c["json"]))
                        ),
                        lambda assembled: _res(
                            json=assembled,
                            varied=(marker == "L")
                            & (
                                F.size(
                                    F.array_distinct(
                                        F.transform(
                                            child_descs,
                                            lambda x: _marker_of(x),
                                        )
                                    )
                                )
                                > 1
                            ),
                            deep=F.exists(cs, lambda c: c["deep"]),
                            err=F.exists(cs, lambda c: c["err"]),
                        ),
                    ),
                )

            ml_branch = let(
                F.from_json(payload, _MAP_SS),
                lambda inner: let(
                    F.when(marker == "M", F.map_values(inner)).otherwise(
                        F.from_json(payload, _ARR_S)
                    ),
                    lambda child_descs: F.when(
                        child_descs.isNull(), _res(err=True)
                    ).otherwise(over_children(inner, child_descs)),
                ),
            )

        return (
            F.when(m.isNull() | (F.size(m) == 0), _res(err=True))
            .when(marker == "NULL", _res(F.lit("null")))
            .when(marker == "BOOL", _res(_bool_json(payload)))
            .when(marker == "N", num)
            .when(marker == "S", scalar_s)
            .when(marker == "B", scalar_s)
            .when(marker == "SS", str_set)
            .when(marker == "BS", str_set)
            .when(marker == "NS", num_set)
            .when((marker == "M") | (marker == "L"), ml_branch)
            .otherwise(_res(err=True))
        )

    return F.when(desc.isNull(), _res(err=True)).otherwise(
        let(F.from_json(desc, _MAP_SS), over_map)
    )


_ERR_TEXT = "DecodeError: malformed envelope or descriptor (JVM decode)"


def decode_universal_jvm(
    df: DataFrame,
    op_col: str = "op",
    keys_col: str = "keys_json",
    image_col: str = "image",
    max_depth: int = 4,
    fallback: bool = True,
) -> DataFrame:
    """Drop-in for :func:`~.dynamodb.decode_universal`, JVM-side.

    Adds the same ``pk``/``typed``/``untyped``/``error`` columns
    (JSON-encoded bucket values).  Rows nesting deeper than ``max_depth``
    M/L levels are decoded by the Arrow kernel when ``fallback`` is True
    (flagged in ``_deep`` otherwise).  Expression size is LINEAR in
    ``max_depth`` (M and L share one recursion site); 4 covers real CDC
    traffic, and the fallback keeps any depth correct.
    """
    op, keys_json, image = F.col(op_col), F.col(keys_col), F.col(image_col)

    eff = F.when(
        (op != F.lit("delete")) & image.isNotNull() & (image != ""), image
    ).otherwise(keys_json)

    fields_expr = let(
        F.from_json(eff, _MAP_SS),
        lambda em: F.when(
            eff.isNotNull() & (eff != "") & em.isNull(),
            F.lit(None).cast(f"array<struct<k:string,r:{_RESULT_T}>>"),
        ).otherwise(
            F.transform(
                F.map_entries(F.coalesce(em, F.from_json(F.lit("{}"), _MAP_SS))),
                lambda e: F.struct(
                    e["key"].alias("k"),
                    _decode_descriptor(e["value"], max_depth).alias("r"),
                ),
            )
        ),
    )

    keys_bad = (
        keys_json.isNotNull()
        & (keys_json != "")
        & F.from_json(keys_json, _MAP_SS).isNull()
    )
    pk_names = F.map_keys(
        F.coalesce(F.from_json(keys_json, _MAP_SS), F.from_json(F.lit("{}"), _MAP_SS))
    )

    def bucket(fields: Column, pred) -> Column:
        return F.map_from_entries(
            F.transform(
                F.filter(fields, pred),
                lambda f: F.struct(
                    f["k"].alias("key"), f["r"]["json"].alias("value")
                ),
            )
        )

    # The full result row is assembled as ONE struct with the decoded
    # field array let-bound, and materialized through explode(array(...)):
    # the Generate node is a projection-collapse barrier, so the (large)
    # decode expression is evaluated exactly once per row.  Naive
    # withColumn chaining would inline it into every referencing column
    # (pk/typed/untyped/error/deep = 6 evaluations per row).
    def assemble(fields: Column) -> Column:
        in_pk = lambda x: F.array_contains(pk_names, x["k"])  # noqa: E731
        varied = lambda x: x["r"]["varied"]  # noqa: E731
        row_err = (
            keys_bad
            | fields.isNull()
            | F.exists(fields, lambda f: f["r"]["err"])
        )
        return F.struct(
            F.when(row_err, F.lit(None)).otherwise(bucket(fields, in_pk)).alias("pk"),
            F.when(row_err, F.lit(None))
            .otherwise(bucket(fields, lambda x: ~in_pk(x) & ~varied(x)))
            .alias("typed"),
            F.when(row_err, F.lit(None)).otherwise(bucket(fields, varied)).alias("untyped"),
            F.when(row_err, F.lit(_ERR_TEXT))
            .otherwise(F.lit(None).cast("string"))
            .alias("error"),
            F.coalesce(
                F.exists(fields, lambda f: f["r"]["deep"]), F.lit(False)
            ).alias("deep"),
        )

    dec = df.select(
        "*", F.explode(F.array(let(fields_expr, assemble))).alias("_r")
    )

    def with_buckets(d: DataFrame) -> DataFrame:
        r = F.col("_r")
        return (
            d.withColumn("pk", r["pk"])
            .withColumn("typed", r["typed"])
            .withColumn("untyped", r["untyped"])
            .withColumn("error", r["error"])
            .withColumn("_deep", r["deep"])
            .drop("_r")
        )

    if not fallback:
        return with_buckets(dec)  # depth-wall rows stay flagged in `_deep`

    shallow = with_buckets(dec.filter(~F.col("_r")["deep"])).drop("_deep")
    deep = decode_universal(
        dec.filter(F.col("_r")["deep"]).drop("_r"),
        op_col=op_col,
        keys_col=keys_col,
        image_col=image_col,
    )
    # align column order for the union (decode_universal appends its
    # outputs after the passthrough columns in UNIVERSAL_SCHEMA order)
    return shallow.unionByName(deep.select(*shallow.columns))


__all__ = ["decode_universal_jvm", "UNIVERSAL_SCHEMA"]
