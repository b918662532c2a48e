"""AWS DMS envelope semantics (SURVEY.md §2.2 P1/P3/P5, §2.3 D8/D9, §2.4 E9).

Reproduces the behavior of the reference's DMS translator
(``/root/reference/src/commons_codec/transform/aws_dms.py``) as data-parallel
primitives:

* envelope validation -> a boolean column + DLQ routing instead of raised
  ``MessageFormatError`` (``aws_dms.py:46-55``);
* ``awsdms_*`` table diversion to schema ``dms`` (``aws_dms.py:39-44``);
* operation dispatch ``load|insert / update / delete / create-table /
  drop-table`` (``aws_dms.py:146-166``) normalized to the engine's
  ``insert|update|delete|control`` vocabulary;
* JSON-in-string re-parse for MAP/OBJECT-typed columns (``decode_data``,
  ``aws_dms.py:207-224``) — compiled to JVM-side column expressions;
* DMS/Kinesis -> sink type resolution (``resolve_type``,
  ``aws_dms.py:226-246``).

Control-plane state (primary keys learned from ``create-table`` events,
column types, ignore_ddl, drop-time reset) lives in
:mod:`commons_codec_spark.registry`, not here: data-plane functions are
pure so they can run on executors.
"""

from __future__ import annotations

from typing import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: DMS operation -> normalized engine op (``aws_dms.py:146-166``).
DMS_OP_MAP = {
    "load": "insert",
    "insert": "insert",
    "update": "update",
    "delete": "delete",
    "create-table": "control",
    "drop-table": "control",
}

#: DMS/Kinesis logical type -> sink type (``aws_dms.py:240-246``); anything
#: unrecognised is TEXT.  Spark-side equivalents included for DDL emission.
DMS_TYPE_MAP = {
    "INT8": "INT1",
    "INT16": "INT2",
    "INT32": "INT4",
    "INT64": "INT8",
}
DMS_TO_SPARK_TYPE = {
    "INT8": "tinyint",
    "INT16": "smallint",
    "INT32": "int",
    "INT64": "bigint",
}


def resolve_type(ltype: str) -> str:
    """Map a DMS/Kinesis data type to the sink type (default TEXT)."""
    return DMS_TYPE_MAP.get(ltype, "TEXT")


def resolve_spark_type(ltype: str) -> str:
    """Map a DMS/Kinesis data type to a Spark SQL type (default string)."""
    return DMS_TO_SPARK_TYPE.get(ltype, "string")


def resolve_type_col(ltype: Column) -> Column:
    """Column form of :func:`resolve_type` (JVM ``CASE`` chain, no UDF)."""
    out = None
    for k, v in DMS_TYPE_MAP.items():
        out = F.when(ltype == k, F.lit(v)) if out is None else out.when(
            ltype == k, F.lit(v)
        )
    return out.otherwise(F.lit("TEXT"))


def route_schema(schema_col: Column, table_col: Column) -> Column:
    """Divert ``awsdms_*`` special tables to the ``dms`` schema."""
    return F.when(table_col.startswith("awsdms_"), F.lit("dms")).otherwise(schema_col)


def is_valid_envelope(
    operation: Column, schema: Column, table: Column
) -> Column:
    """Envelope sanity predicate (replaces raised ``MessageFormatError``).

    Rows failing this are routed to the dead-letter output by the pipeline,
    never raised: a poison event must not kill a 1000-executor stream.
    """
    nonempty = lambda c: c.isNotNull() & (c != "")  # noqa: E731
    return nonempty(operation) & nonempty(schema) & nonempty(table)


def normalize_op(op_col: Column) -> Column:
    """Normalize a DMS operation string to insert/update/delete/control/NULL."""
    expr = F.lit(None).cast("string")
    out = None
    for k, v in DMS_OP_MAP.items():
        out = F.when(op_col == k, F.lit(v)) if out is None else out.when(
            op_col == k, F.lit(v)
        )
    return out.otherwise(expr)


def split_valid_invalid(
    df: DataFrame, op: str = "operation", schema: str = "schema_name",
    table: str = "table_name",
) -> tuple[DataFrame, DataFrame]:
    """Split a micro-batch into (valid, dead-letter) DataFrames."""
    pred = is_valid_envelope(F.col(op), F.col(schema), F.col(table))
    return df.filter(pred), df.filter(~pred | pred.isNull())


def make_dms_decoder(
    payload_schema: Mapping[str, str],
    keys: list[str],
    envelope_col: str = "envelope",
    target_schema: str | None = None,
    target_table: str | None = None,
):
    """Pipeline decoder for raw AWS DMS envelopes (EP1, fully JVM-side).

    A DMS event is ``{"data": {...plain JSON values...}, "metadata":
    {"operation": ..., "schema-name": ..., "table-name": ...}}``
    (``/root/reference/src/commons_codec/transform/aws_dms.py:28-83``) —
    unlike DynamoDB images, ``data`` carries plain JSON, so the whole
    decode is one ``from_json``.  The returned callable suits
    ``PipelineConfig.decoder``: it normalizes the operation
    (load|insert -> insert, create/drop-table -> control), applies
    ``awsdms_*`` routing, filters to the target table when given, and
    routes invalid envelopes (missing operation/schema/table —
    ``MessageFormatError``, ``aws_dms.py:46-55``) to the DLQ by nulling
    their key columns.
    """
    data_ddl = ", ".join(f"`{c}` {t}" for c, t in payload_schema.items())
    env_ddl = (
        f"struct<`data`: struct<{data_ddl}>, "
        "`metadata`: struct<`operation` string, `schema-name` string, "
        "`table-name` string>>"
    )

    def decode(df: DataFrame) -> DataFrame:
        parsed = F.from_json(F.col(envelope_col), env_ddl)
        d = df.withColumn("__env", parsed)
        meta = F.col("__env.metadata")
        routed = route_schema(meta["schema-name"], meta["table-name"])
        valid = is_valid_envelope(meta["operation"], routed, meta["table-name"])
        if target_schema and target_table:
            d = d.filter(
                ~valid
                | ((routed == target_schema) & (meta["table-name"] == target_table))
            )
        out_cols = [
            # invalid envelope -> NULL keys -> pipeline DLQ split
            (F.when(valid, F.col(f"__env.data.{c}")) if c in keys
             else F.col(f"__env.data.{c}")).alias(c)
            for c in payload_schema
        ]
        return d.select(
            *[c for c in df.columns if c != envelope_col],
            normalize_op(meta["operation"]).alias("op"),
            routed.alias("schema_routed"),
            meta["table-name"].alias("table_routed"),
            *out_cols,
        )

    return decode


def reparse_object_columns(
    df: DataFrame, column_types: Mapping[str, str], json_schemas: Mapping[str, str]
) -> DataFrame:
    """JVM-side ``decode_data``: re-parse JSON-in-string MAP/OBJECT columns.

    DMS marshals JSON/JSONB source columns to CLOB (strings); the reference
    re-parses them per record with ``json.loads`` (``aws_dms.py:221-223``).
    Here each annotated column becomes one ``from_json`` expression —
    vectorized, codegen'd, no Python.

    ``column_types`` maps column -> "map"|"object" (only annotated columns
    are touched); ``json_schemas`` maps column -> Spark DDL schema string
    for the parsed value (default permissive ``map<string,string>``).
    """
    out = df
    for col, ctype in column_types.items():
        if ctype not in ("map", "object") or col not in df.columns:
            continue
        schema = json_schemas.get(col, "map<string,string>")
        out = out.withColumn(col, F.from_json(F.col(col).cast("string"), schema))
    return out
