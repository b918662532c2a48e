"""DMS envelope semantics + schema registry (P1/P3/P5, D8/D9, E6/E7 analogs).

Expectations mirror `/root/reference/tests/transform/test_aws_dms_universal.py`
(validation, awsdms_ routing, create/drop schema-state fold, JSON-in-string
re-parse) re-expressed as DataFrame-level behavior.
"""

import json

import pyspark.sql.functions as F

from commons_codec_spark.functions import dms
from commons_codec_spark.registry import SchemaRegistry, TableState


def test_resolve_type_int_family_and_default():
    assert dms.resolve_type("INT8") == "INT1"
    assert dms.resolve_type("INT32") == "INT4"
    assert dms.resolve_type("INT64") == "INT8"
    assert dms.resolve_type("VARCHAR") == "TEXT"
    assert dms.resolve_spark_type("INT64") == "bigint"
    assert dms.resolve_spark_type("JSON") == "string"


def test_envelope_validation_and_routing(spark):
    df = spark.createDataFrame(
        [
            ("insert", "public", "foo"),
            ("insert", "public", "awsdms_apply_exceptions"),
            (None, "public", "foo"),  # missing operation
            ("insert", "", "foo"),  # empty schema
        ],
        "operation string, schema_name string, table_name string",
    )
    df = df.withColumn(
        "schema_name", dms.route_schema(F.col("schema_name"), F.col("table_name"))
    )
    valid, dlq = dms.split_valid_invalid(df)
    v = [r.asDict() for r in valid.orderBy("table_name").collect()]
    assert len(v) == 2 and dlq.count() == 2
    routed = [r for r in v if r["table_name"].startswith("awsdms_")][0]
    assert routed["schema_name"] == "dms"


def test_normalize_op(spark):
    df = spark.createDataFrame(
        [("load",), ("insert",), ("update",), ("delete",), ("create-table",), ("bogus",)],
        "operation string",
    )
    out = [
        r.op
        for r in df.select(dms.normalize_op(F.col("operation")).alias("op")).collect()
    ]
    assert out == ["insert", "insert", "update", "delete", "control", None]


def test_reparse_object_columns(spark):
    df = spark.createDataFrame(
        [(42, json.dumps({"foo": "bar"}))], "id int, attributes string"
    )
    out = dms.reparse_object_columns(
        df, {"attributes": "object"}, {"attributes": "map<string,string>"}
    )
    row = out.collect()[0]
    assert row.attributes == {"foo": "bar"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # re-parse stays JVM-side


def test_registry_create_learns_pks_and_drop_resets():
    reg = SchemaRegistry({"public:foo": TableState(primary_keys=["id"])})
    reg.apply_create_table("public", "foo", {"primary-key": ["id", "tenant"]})
    assert reg.primary_keys("public", "foo") == ["id", "tenant"]
    reg.apply_drop_table("public", "foo")
    # drop restores the caller-seeded state (aws_dms.py:175-177)
    assert reg.primary_keys("public", "foo") == ["id"]
    assert not reg.get("public", "foo").exists


def test_registry_ignore_ddl():
    st = TableState(primary_keys=["id"], ignore_ddl=True)
    reg = SchemaRegistry({"public:foo": st})
    reg.apply_create_table("public", "foo", {"primary-key": ["other"]})
    assert reg.primary_keys("public", "foo") == ["id"]


def test_registry_additive_columns_and_roundtrip(tmp_path):
    reg = SchemaRegistry()
    fresh = reg.note_columns("public", "foo", ["repo", "path", "content"])
    assert fresh == ["repo", "path", "content"]
    assert reg.note_columns("public", "foo", ["content", "lang"]) == ["lang"]
    reg.save(str(tmp_path), batch_id=7)
    loaded = SchemaRegistry.load(str(tmp_path))
    assert loaded.get("public", "foo").extra_columns == ["repo", "path", "content", "lang"]
