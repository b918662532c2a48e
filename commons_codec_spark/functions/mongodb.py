"""MongoDB Extended JSON decode lattice (SURVEY.md §2.3 D4–D7) + CDC translate.

Reproduces the semantics of the reference's converter
(``/root/reference/src/commons_codec/transform/mongodb.py:67-187``) without
pymongo/bson (not available here): the canonical Extended JSON subset is
decoded directly from the public spec, and live bson objects (pymongo
cursors) are duck-typed by class name in :func:`decode_bson_native`
(https://www.mongodb.com/docs/manual/reference/mongodb-extended-json/),
validated against the reference's golden pairs
(``tests/transform/mongodb/data.py:15-224`` — the ``canonical`` section).

Decode rules (with default flags ``timestamp_to_epoch=True,
timestamp_use_milliseconds=True``, the CDC translator defaults,
``mongodb.py:227``):

* ``$oid`` → hex string
* ``$date`` ISO-8601 / ``{"$numberLong": s}`` / bare int → epoch-ms int
  (second resolution × 1000 — the reference goes through
  ``calendar.timegm(utctimetuple())``, truncating sub-second parts);
  out-of-range epochs → ``0`` (InvalidBSON fallback, ``mongodb.py:130-134``)
* ``$numberInt`` → int, ``$numberDouble`` → float,
  ``$numberLong`` → **string** (pymongo yields ``bson.Int64`` which the
  reference stringifies), except inside ``$date``
* ``$numberDecimal`` → string (``"42.42"``, ``"NaN"``, ``"Infinity"``)
* ``$binary`` subtype 04 → UUID string; other subtypes → normalized base64
* ``$timestamp {t,i}`` → epoch-ms int (t × 1000)
* ``$regularExpression`` → ``"Regex('<pattern>', <flags>)"``
* ``$symbol`` → plain string; ``$code`` (scopeless) → code string
* ``$maxKey``/``$minKey`` → ``"MaxKey()"`` / ``"MinKey()"``
* ``$undefined`` → None
* multi-key ``$``-dicts (``$code+$scope``, DBRef) recurse as plain dicts

Sets/tuples (Python-native inputs) decode to sorted lists / lists for
distributed determinism (reference materializes Python ``set`` iteration
order; its tests use ``mock.ANY`` for that reason).
"""

from __future__ import annotations

import base64
import calendar
import datetime as dt
import json
import re
import uuid
from typing import Any, Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_RE_FLAG_VALUES = {"i": 2, "l": 4, "m": 8, "s": 16, "u": 32, "x": 64}

#: datetime bounds representable by bson (yields InvalidBSON outside)
_MS_MIN = -62135596800000  # year 1
_MS_MAX = 253402300799999  # year 9999


class MongoDecodeConfig:
    def __init__(
        self,
        timestamp_to_epoch: bool = True,
        timestamp_to_iso8601: bool = False,
        timestamp_use_milliseconds: bool = True,
        treatment=None,
    ):
        self.timestamp_to_epoch = timestamp_to_epoch
        self.timestamp_to_iso8601 = timestamp_to_iso8601
        self.timestamp_use_milliseconds = timestamp_use_milliseconds
        #: Optional :class:`functions.treatment.Treatment`, applied to each
        #: plain dict BEFORE its children decode — the reference's
        #: ``apply_special_treatments`` position (``mongodb.py:84``), which
        #: is what makes ``normalize_complex_lists`` stringify raw markers.
        self.treatment = treatment


DEFAULT_CONFIG = MongoDecodeConfig()


def _parse_iso(value: str) -> dt.datetime:
    v = value.replace("Z", "+00:00")
    out = dt.datetime.fromisoformat(v)
    if out.tzinfo is None:
        out = out.replace(tzinfo=dt.timezone.utc)
    return out


def convert_epoch(value: Any) -> float:
    """int passthrough; datetime/str/bytes → UTC epoch seconds (D6)."""
    if isinstance(value, bool):
        raise ValueError(f"Unable to convert datetime value: {value}")
    if isinstance(value, int):
        return value
    if isinstance(value, dt.datetime):
        datetime = value
    elif isinstance(value, bytes):
        datetime = _parse_iso(value.decode("utf-8"))
    elif isinstance(value, str):
        datetime = _parse_iso(value)
    else:
        raise ValueError(f"Unable to convert datetime value: {value}")
    return calendar.timegm(datetime.utctimetuple())


def convert_iso8601(value: Any) -> str:
    """str passthrough; int/datetime/bytes → isoformat (D7)."""
    if isinstance(value, str):
        return value
    if isinstance(value, bytes):
        return value.decode("utf-8")
    if isinstance(value, dt.datetime):
        return value.isoformat()
    if isinstance(value, int):
        return dt.datetime.fromtimestamp(value, tz=dt.timezone.utc).isoformat()
    raise ValueError(f"Unable to convert datetime value: {value}")


def _decode_datetime(ms: int, config: MongoDecodeConfig) -> Any:
    if ms < _MS_MIN or ms > _MS_MAX:
        return 0  # InvalidBSON fallback (mongodb.py:130-134)
    when = dt.datetime.fromtimestamp(ms / 1000.0, tz=dt.timezone.utc)
    if config.timestamp_to_epoch:
        out = convert_epoch(when)
        if config.timestamp_use_milliseconds:
            out = int(out) * 1000
        return out
    if config.timestamp_to_iso8601:
        return convert_iso8601(when)
    return when


def decode_extended_json(value: dict, config: MongoDecodeConfig = DEFAULT_CONFIG) -> Any:
    """Decode one single-key ``$``-prefixed canonical dict (D5)."""
    marker = next(iter(value))
    payload = value[marker]

    if marker == "$oid":
        return str(payload)
    if marker == "$date":
        if isinstance(payload, dict):
            ms = int(payload["$numberLong"])
        elif isinstance(payload, str):
            when = _parse_iso(payload)
            ms = int(calendar.timegm(when.utctimetuple())) * 1000 + when.microsecond // 1000
        else:
            ms = int(payload)
        return _decode_datetime(ms, config)
    if marker == "$numberInt":
        return int(payload)
    if marker == "$numberDouble":
        return float(payload)
    if marker == "$numberLong":
        return str(int(payload))  # bson.Int64 stringified by the reference
    if marker == "$numberDecimal":
        return str(payload)
    if marker == "$binary":
        raw = base64.b64decode(payload["base64"])
        subtype = int(payload.get("subType", "0"), 16)
        if subtype in (3, 4):
            if subtype == 4:
                return str(uuid.UUID(bytes=raw))
            return base64.b64encode(raw).decode()
        return base64.b64encode(raw).decode()
    if marker == "$uuid":
        return str(payload)
    if marker == "$timestamp":
        return _decode_datetime(int(payload["t"]) * 1000, config)
    if marker == "$regularExpression":
        flags = sum(_RE_FLAG_VALUES.get(c, 0) for c in payload.get("options", ""))
        return f"Regex('{payload['pattern']}', {flags})"
    if marker == "$symbol":
        return str(payload)
    if marker == "$code":
        return str(payload)
    if marker == "$maxKey":
        return "MaxKey()"
    if marker == "$minKey":
        return "MinKey()"
    if marker == "$undefined":
        return None
    # Unknown $-marker: keep as-is (reference's object_hook passthrough)
    return {marker: decode_value(payload, config)}


def decode_bson_native(value: Any, config: MongoDecodeConfig) -> Any:
    """Native bson/python object -> decoded value (D4, best effort).

    The reference's ``decode_bson`` receives live pymongo objects
    (``/root/reference/src/commons_codec/transform/mongodb.py:89-113``).
    pymongo isn't installed in this environment, so bson classes are
    duck-typed by class name — against a real pymongo cursor the same
    dispatch applies; returns a sentinel when nothing matches.
    """
    if type(value) is bytes:  # raw bytes; bson Binary (a bytes subclass)
        return base64.b64encode(value).decode()  # dispatches by name below
    if isinstance(value, uuid.UUID):
        return str(value)
    name = type(value).__name__
    if name == "ObjectId":
        return str(value)
    if name == "Int64":
        return str(int(value))
    if name in ("Decimal128", "Decimal"):
        return str(value)
    if name == "Timestamp":  # bson Timestamp(t, i)
        return _decode_datetime(int(value.time) * 1000, config)
    if name == "Binary":
        raw = bytes(value)
        if getattr(value, "subtype", 0) == 4:
            return str(uuid.UUID(bytes=raw))
        return base64.b64encode(raw).decode()
    if name == "Regex":
        return f"Regex('{value.pattern}', {value.flags})"
    if name in ("Symbol", "Code"):
        return str(value)
    if name == "MinKey":
        return "MinKey()"
    if name == "MaxKey":
        return "MaxKey()"
    return _NO_BSON_MATCH


_NO_BSON_MATCH = object()


def decode_value(value: Any, config: MongoDecodeConfig = DEFAULT_CONFIG) -> Any:
    """Recursive Extended JSON walk (``mongodb.py:67-87``), accepting both
    the canonical wire form (``$``-marker dicts) and native bson/python
    objects (pymongo cursors, D4)."""
    if isinstance(value, dict):
        if len(value) == 1 and next(iter(value)).startswith("$"):
            return decode_extended_json(value, config)
        if config.treatment is not None:
            value = config.treatment.apply(value)
        return {k: decode_value(v, config) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [decode_value(v, config) for v in value]
    if isinstance(value, set):
        try:
            return sorted(value)
        except TypeError:
            return list(value)
    if isinstance(value, dt.datetime):
        return _decode_datetime(
            int(calendar.timegm(value.utctimetuple())) * 1000
            + value.microsecond // 1000,
            config,
        )
    native = decode_bson_native(value, config)
    if native is not _NO_BSON_MATCH:
        return native
    return value


def decode_document(doc: dict, config: MongoDecodeConfig = DEFAULT_CONFIG) -> dict:
    return decode_value(doc, config)


def decode_cdc_event(event: dict, config: MongoDecodeConfig = DEFAULT_CONFIG) -> dict | None:
    """Change-stream event → normalized change row (EP3, ``mongodb.py:304-348``).

    Returns ``{"op", "oid", "record"}``; ``drop``/``invalidate`` → None;
    missing/unknown operationType raises ValueError (→ DLQ when vectorized).
    """
    op_type = event.get("operationType")
    if not op_type:
        raise ValueError(f"Operation Type missing or empty: {event}")
    oid_raw = event.get("documentKey", {}).get("_id")
    oid = (
        decode_value(oid_raw, config) if isinstance(oid_raw, dict) else str(oid_raw)
    )
    if op_type == "insert":
        return {"op": "insert", "oid": str(oid), "record": decode_document(event.get("fullDocument") or {}, config)}
    if op_type in ("update", "replace"):
        return {"op": "update", "oid": str(oid), "record": decode_document(event.get("fullDocument") or {}, config)}
    if op_type == "delete":
        return {"op": "delete", "oid": str(oid), "record": None}
    if op_type in ("drop", "invalidate"):
        return None
    raise ValueError(f"Unknown CDC operation type: {op_type}")


# ---------------------------------------------------------------------------
# Vectorized form
# ---------------------------------------------------------------------------

MONGO_CDC_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("oid", T.StringType()),
        T.StructField("record", T.StringType()),  # JSON-encoded decoded doc
        T.StructField("error", T.StringType()),
    ]
)


def decode_mongo_events_pandas(
    events_json: pd.Series, config: MongoDecodeConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Arrow-batch kernel: change-stream event JSON -> (op, oid, record)."""
    out = {"op": [], "oid": [], "record": [], "error": []}
    for payload in events_json:
        try:
            rec = decode_cdc_event(json.loads(payload), config)
            if rec is None:  # drop/invalidate → skip row downstream
                out["op"].append(None)
                out["oid"].append(None)
                out["record"].append(None)
                out["error"].append(None)
                continue
            out["op"].append(rec["op"])
            out["oid"].append(rec["oid"])
            out["record"].append(
                json.dumps(rec["record"], separators=(",", ":"), sort_keys=True)
                if rec["record"] is not None
                else None
            )
            out["error"].append(None)
        except Exception as exc:  # noqa: BLE001 — poison rows go to DLQ
            out["op"].append(None)
            out["oid"].append(None)
            out["record"].append(None)
            out["error"].append(f"{type(exc).__name__}: {exc}")
    return pd.DataFrame(out)


def make_mongo_decoder(
    payload_schema: dict[str, str],
    event_col: str = "event",
    config: MongoDecodeConfig = DEFAULT_CONFIG,
):
    """Pipeline decoder for MongoDB change-stream envelopes (EP3).

    Returns a callable suitable for ``PipelineConfig.decoder``: the Arrow
    lattice decode (:func:`decode_mongo_cdc`) produces ``op``/``oid`` plus
    the decoded document as JSON; the document's fields are then lifted
    into typed columns JVM-side via ``from_json`` using ``payload_schema``
    (column -> spark ddl type).  ``drop``/``invalidate`` events (op NULL,
    no error) are skipped silently, matching the reference's ``None``
    return (``mongodb.py:337-343``); poison events keep ``error`` set and
    flow to the pipeline's DLQ split (their key is NULL).
    """
    ddl = ", ".join(f"`{c}` {t}" for c, t in payload_schema.items())

    def decode(batch: DataFrame) -> DataFrame:
        d = decode_mongo_cdc(batch, event_col, config)
        d = d.filter(F.col("op").isNotNull() | F.col("error").isNotNull())
        rec = F.from_json(F.col("record"), ddl)
        keep = [c for c in d.columns if c != "record"]
        return d.select(*keep, *[rec[c].alias(c) for c in payload_schema])

    return decode


def decode_mongo_documents_pandas(
    docs_json: pd.Series, config: MongoDecodeConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Arrow-batch kernel: Extended-JSON document -> (oid, record).

    Full-load shape (S5): no change-stream envelope, just documents; the
    document key is the decoded ``_id`` (reference
    ``MongoDBFullLoadTranslator.get_document_key`` + ``to_sql``,
    ``/root/reference/src/commons_codec/transform/mongodb.py:244-269``).
    The record keeps ``_id`` — the reference stores the full document in
    the data column alongside the oid key.
    """
    out = {"oid": [], "record": [], "error": []}
    for payload in docs_json:
        try:
            doc = decode_document(json.loads(payload), config)
            oid = doc.get("_id")
            if oid is None:
                raise ValueError(f"Document key (_id) missing: {payload[:80]}")
            out["oid"].append(str(oid))
            out["record"].append(json.dumps(doc, separators=(",", ":"), sort_keys=True))
            out["error"].append(None)
        except Exception as exc:  # noqa: BLE001 — poison rows go to DLQ
            out["oid"].append(None)
            out["record"].append(None)
            out["error"].append(f"{type(exc).__name__}: {exc}")
    return pd.DataFrame(out)


def make_mongo_full_load_decoder(
    payload_schema: dict[str, str],
    doc_col: str = "document",
    config: MongoDecodeConfig = DEFAULT_CONFIG,
):
    """Full-load decoder for ``CDCPipeline.full_load(batch, decoder=...)``.

    Takes a batch of raw Extended-JSON documents (one per row in
    ``doc_col``), decodes them through the same lattice as the CDC path,
    and lifts the fields in ``payload_schema`` into typed columns —
    the Spark form of the reference's ``MongoDBFullLoadTranslator``
    batch-INSERT (``mongodb.py:253-269``).  Poison documents surface with
    ``oid`` NULL + ``error`` set (the pipeline's DLQ split).
    """
    ddl = ", ".join(f"`{c}` {t}" for c, t in payload_schema.items())

    def decode(batch: DataFrame) -> DataFrame:
        passthrough = [f for f in batch.schema.fields if f.name != doc_col]
        out_schema = T.StructType(
            list(passthrough)
            + [
                T.StructField("oid", T.StringType()),
                T.StructField("record", T.StringType()),
                T.StructField("error", T.StringType()),
            ]
        )

        def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                decoded = decode_mongo_documents_pandas(pdf[doc_col], config)
                decoded.index = pdf.index
                yield pd.concat([pdf.drop(columns=[doc_col]), decoded], axis=1)

        d = batch.mapInPandas(_map, schema=out_schema)
        rec = F.from_json(F.col("record"), ddl)
        keep = [c for c in d.columns if c != "record"]
        return d.select(*keep, *[rec[c].alias(c) for c in payload_schema])

    return decode


def decode_mongo_cdc(
    df: DataFrame, event_col: str = "event",
    config: MongoDecodeConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """mapInPandas wrapper: decode a stream of change-stream event JSON."""
    passthrough = [f for f in df.schema.fields if f.name != event_col]
    out_schema = T.StructType(list(passthrough) + list(MONGO_CDC_SCHEMA.fields))

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_mongo_events_pandas(pdf[event_col], config)
            decoded.index = pdf.index
            yield pd.concat([pdf.drop(columns=[event_col]), decoded], axis=1)

    return df.mapInPandas(_map, schema=out_schema)


# ---------------------------------------------------------------------------
# Compiled (JVM) change-stream decode — known payload schema, DIRECT shape
# ---------------------------------------------------------------------------

#: column type -> canonical Extended-JSON wrapper parsed for it
_MONGO_DIRECT_WRAPPERS = {
    "string": "string",
    "bool": "boolean",
    "oid": "struct<`$oid`: string>",
    "int": "struct<`$numberInt`: string>",
    "long": "struct<`$numberLong`: string>",
    "double": "struct<`$numberDouble`: string>",
    "decimal": "struct<`$numberDecimal`: string>",
    "date": "struct<`$date`: struct<`$numberLong`: string>>",
}


def _mongo_direct_field(doc: Column, name: str, typ: str,
                        config: MongoDecodeConfig) -> Column:
    """Unwrap one canonical Extended-JSON field to its decoded value,
    matching :func:`decode_extended_json` for that marker."""
    raw = doc[name]
    # numeric unwraps use try_cast: the session runs ANSI mode, where one
    # malformed $number* payload would throw CAST_INVALID_INPUT and kill
    # the batch; a poison value decodes NULL instead (DLQ via null keys).
    if typ == "string" or typ == "bool":
        out = raw
    elif typ == "oid":
        out = raw["$oid"]
    elif typ == "int":
        out = raw["$numberInt"].try_cast("long")
    elif typ == "long":
        out = raw["$numberLong"]  # reference stringifies bson.Int64
    elif typ == "double":
        out = raw["$numberDouble"].try_cast("double")
    elif typ == "decimal":
        out = raw["$numberDecimal"]
    elif typ == "date":
        ms = raw["$date"]["$numberLong"].try_cast("long")
        if config.timestamp_to_epoch and config.timestamp_use_milliseconds:
            out = (F.floor(ms / 1000) * 1000).cast("long")
        elif config.timestamp_to_epoch:
            out = (ms / 1000.0).cast("double")
        else:
            out = F.timestamp_millis(ms)
    else:  # pragma: no cover — validated below
        raise ValueError(typ)
    return out.alias(name)


def compile_mongo_direct_decoder(
    df: DataFrame,
    event_col: str,
    columns: dict[str, str],
    config: MongoDecodeConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """EP3's DIRECT path: change-stream envelope -> op/oid + typed columns,
    one ``from_json``, no Python workers.

    ``columns`` maps fullDocument field -> type in
    ``string|bool|oid|int|long|double|decimal|date`` (the canonical
    Extended-JSON wire wrappers the Arrow lattice handles dynamically —
    use :func:`decode_mongo_cdc` when the payload schema is unknown or
    uses non-canonical forms).  Op vocabulary matches ``decode_cdc_event``
    (``/root/reference/src/commons_codec/transform/mongodb.py:304-348``):
    insert; update/replace -> update; delete (record NULL); drop and
    invalidate -> op NULL (skip); missing/unknown operationType or
    unparseable JSON -> ``error`` (DLQ).
    """
    bad_types = {t for t in columns.values()} - set(_MONGO_DIRECT_WRAPPERS)
    if bad_types:
        raise ValueError(f"unsupported DIRECT column types: {sorted(bad_types)}")
    doc_ddl = ", ".join(
        f"`{n}` {_MONGO_DIRECT_WRAPPERS[t]}" for n, t in columns.items()
    )
    schema = (
        "struct<operationType: string,"
        " documentKey: struct<`_id`: struct<`$oid`: string>>,"
        f" fullDocument: struct<{doc_ddl}>,"
        " _corrupt: string>"
    )
    p = F.from_json(
        F.col(event_col), schema, {"columnNameOfCorruptRecord": "_corrupt"}
    )
    opt = p["operationType"]
    known = ("insert", "update", "replace", "delete", "drop", "invalidate")
    bad = (
        p.isNull()
        | p["_corrupt"].isNotNull()
        | opt.isNull()
        | (opt == "")
        | ~opt.isin(*known)
    )
    op = (
        F.when(bad, F.lit(None).cast("string"))
        .when(opt == "insert", F.lit("insert"))
        .when(opt.isin("update", "replace"), F.lit("update"))
        .when(opt == "delete", F.lit("delete"))
        .otherwise(F.lit(None).cast("string"))  # drop/invalidate: skip
    )
    err = F.when(
        bad, F.lit("DecodeError: malformed change-stream envelope")
    ).otherwise(F.lit(None).cast("string"))
    doc = p["fullDocument"]
    keep = [c for c in df.columns if c != event_col]
    typed = [
        F.when(op.isin("insert", "update"), _mongo_direct_field(doc, n, t, config))
        .otherwise(F.lit(None))
        .alias(n)
        for n, t in columns.items()
    ]
    return df.select(
        *keep,
        op.alias("op"),
        F.when(~bad, p["documentKey"]["_id"]["$oid"]).alias("oid"),
        *typed,
        err.alias("error"),
    )
