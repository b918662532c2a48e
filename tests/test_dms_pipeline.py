"""Raw AWS DMS envelopes through the full ingest pipeline (EP1 end-to-end).

Envelope shape per the reference's test corpus
(`/root/reference/tests/transform/test_aws_dms_universal.py:54-160`):
plain-JSON ``data`` + ``metadata.operation/schema-name/table-name``.
"""

import json

from commons_codec_spark.functions.dms import make_dms_decoder
from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig

PAYLOAD = {"repo": "string", "path": "string", "commit": "string", "size": "bigint"}


def _env(op, seq, data=None, schema="public", table="source_code"):
    meta = {"operation": op, "schema-name": schema, "table-name": table}
    return (json.dumps({"data": data or {}, "metadata": meta}), seq)


def _pipe(spark, tmp_path):
    table = KeyedLakeTable.create(
        spark, str(tmp_path / "tbl"),
        key_schema={"repo": "string", "path": "string"}, n_buckets=2,
    )
    cfg = PipelineConfig(
        keys=["repo", "path"],
        image_columns={"repo": "S", "path": "S", "commit": "S", "size": "N"},
        decoder=make_dms_decoder(
            PAYLOAD, keys=["repo", "path"],
            target_schema="public", target_table="source_code",
        ),
        discover_columns=False,
    )
    return table, CDCPipeline(spark, table, cfg, checkpoint_dir=str(tmp_path / "ck"))


def test_dms_envelope_end_to_end(spark, tmp_path):
    rows = [
        _env("load", 0, {"repo": "r", "path": "a", "commit": "c0", "size": 1}),
        _env("insert", 1, {"repo": "r", "path": "b", "commit": "c1", "size": 2}),
        _env("update", 2, {"repo": "r", "path": "a", "commit": "c2", "size": 3}),
        _env("delete", 3, {"repo": "r", "path": "b"}),
        # different table: filtered out entirely
        _env("insert", 4, {"repo": "x", "path": "x", "commit": "cx", "size": 9},
             table="other_table"),
        # awsdms_* diversion: routed to schema `dms`, so also filtered
        _env("insert", 5, {"repo": "y", "path": "y", "commit": "cy", "size": 9},
             table="awsdms_apply_exceptions"),
        # invalid envelope (missing operation): DLQ
        (json.dumps({"data": {"repo": "z", "path": "z"},
                     "metadata": {"schema-name": "public",
                                  "table-name": "source_code"}}), 6),
    ]
    batch = spark.createDataFrame(rows, "envelope string, commit_seq long")
    table, pipe = _pipe(spark, tmp_path)
    m = pipe.apply_batch(batch, batch_id=0)
    assert m["dlq_rows"] == 1
    state = {(r.repo, r.path): (r.commit, r.size) for r in table.read().collect()}
    assert state == {("r", "a"): ("c2", 3)}  # load+update survive, delete applied


def test_dms_load_is_insert_and_redelivery_safe(spark, tmp_path):
    rows = [
        _env("load", 0, {"repo": "r", "path": "a", "commit": "c0", "size": 1}),
        _env("load", 0, {"repo": "r", "path": "a", "commit": "c0", "size": 1}),
    ]
    batch = spark.createDataFrame(rows, "envelope string, commit_seq long")
    table, pipe = _pipe(spark, tmp_path)
    pipe.apply_batch(batch, batch_id=0)
    assert table.read().count() == 1
