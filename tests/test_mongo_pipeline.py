"""MongoDB change-stream dialect through the full ingest pipeline.

The reference's flagship example is a Mongo change stream relayed to a sink
(`/root/reference/examples/mongodb_cdc_cratedb.py:40-61`); here the same
envelopes drive decode → fold → merge with the table keyed on the document
id, and the final state is checked against the sequential dict oracle.
"""

import json

import pyspark.sql.functions as F

from commons_codec_spark.functions.mongodb import make_mongo_decoder
from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig


def _event(op, oid, seq, doc=None):
    env = {
        "operationType": op,
        "documentKey": {"_id": {"$oid": f"{oid:024x}"}},
    }
    if doc is not None:
        env["fullDocument"] = {
            "name": doc["name"],
            "age": {"$numberInt": str(doc["age"])},
        }
    return (json.dumps(env), seq)


def _events():
    out = []
    # oid 1: insert, update, re-delivered insert (must not clobber)
    out.append(_event("insert", 1, 0, {"name": "ada", "age": 30}))
    out.append(_event("update", 1, 1, {"name": "ada", "age": 31}))
    out.append(_event("insert", 1, 2, {"name": "ada", "age": 30}))
    # oid 2: insert then delete
    out.append(_event("insert", 2, 3, {"name": "bob", "age": 40}))
    out.append(_event("delete", 2, 4))
    # oid 3: replace (-> update) after insert
    out.append(_event("insert", 3, 5, {"name": "cyd", "age": 50}))
    out.append(_event("replace", 3, 6, {"name": "cyd", "age": 51}))
    # drop event: skipped silently
    out.append((json.dumps({"operationType": "drop"}), 7))
    # update of a key never inserted: no-op
    out.append(_event("update", 9, 8, {"name": "zed", "age": 1}))
    return out


def test_mongo_dialect_end_to_end(spark, tmp_path):
    batch = spark.createDataFrame(_events(), "event string, commit_seq long")
    table = KeyedLakeTable.create(
        spark, str(tmp_path / "tbl"), key_schema={"oid": "string"}, n_buckets=2
    )
    cfg = PipelineConfig(
        keys=["oid"],
        image_columns={"oid": "S", "name": "S", "age": "N"},
        decoder=make_mongo_decoder({"name": "string", "age": "bigint"}),
        discover_columns=False,
    )
    pipe = CDCPipeline(spark, table, cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    m = pipe.apply_batch(batch, batch_id=0)
    assert m["dlq_rows"] == 0

    state = {r.oid: (r.name, r.age) for r in table.read().collect()}
    assert state == {
        f"{1:024x}": ("ada", 31),   # re-delivered insert did not clobber
        f"{3:024x}": ("cyd", 51),   # replace applied
    }                               # oid 2 deleted; oid 9 update was a no-op


def test_mongo_poison_event_routes_to_dlq(spark, tmp_path):
    rows = [
        ('{"operationType":"insert","documentKey":{"_id":{"$oid":"' + "0" * 24 + '"}},'
         '"fullDocument":{"name":"ok","age":{"$numberInt":"1"}}}', 0),
        ('{"broken', 1),                      # malformed JSON
        ('{"documentKey":{"_id":"x"}}', 2),   # missing operationType
    ]
    batch = spark.createDataFrame(rows, "event string, commit_seq long")
    table = KeyedLakeTable.create(
        spark, str(tmp_path / "tbl2"), key_schema={"oid": "string"}, n_buckets=2
    )
    cfg = PipelineConfig(
        keys=["oid"],
        image_columns={"oid": "S", "name": "S", "age": "N"},
        decoder=make_mongo_decoder({"name": "string", "age": "bigint"}),
        discover_columns=False,
    )
    pipe = CDCPipeline(spark, table, cfg, checkpoint_dir=str(tmp_path / "ckpt2"))
    m = pipe.apply_batch(batch, batch_id=0)
    assert m["dlq_rows"] == 2
    assert table.read().count() == 1
