"""Multi-table fan-out: one heterogeneous stream into N keyed lake tables.

Pins the reference's multi-table translation semantics
(``aws_dms.py:39-44,86-115,133-144``): per-event (schema, table) routing,
``awsdms_*`` diversion to the ``dms`` schema, per-table schema state in one
shared registry, unknown tables skipped (counted / DLQ'd) without killing
the stream, and exactly-once across all sinks under replay.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.streaming.fanout import MultiTablePipeline, TableTarget
from commons_codec_spark.streaming.pipeline import PipelineConfig


def _mk_events(spark):
    """Interleaved two-table batch + awsdms_* rows + an unknown table."""
    rows = []
    # public.users: inserts then one update and one delete
    for uid in range(8):
        rows.append(
            ("insert", 10 + uid, "public", "users",
             '{"uid":{"N":"%d"}}' % uid,
             '{"uid":{"N":"%d"},"name":{"S":"u%d"}}' % (uid, uid), 0)
        )
    rows.append(
        ("update", 100, "public", "users", '{"uid":{"N":"3"}}',
         '{"uid":{"N":"3"},"name":{"S":"u3-upd"}}', 0)
    )
    rows.append(("delete", 101, "public", "users", '{"uid":{"N":"5"}}', None, 0))
    # public.orders: different payload schema (amount)
    for oid in range(5):
        rows.append(
            ("insert", 20 + oid, "public", "orders",
             '{"oid":{"N":"%d"}}' % oid,
             '{"oid":{"N":"%d"},"amount":{"N":"%d"}}' % (oid, 100 * oid), 0)
        )
    # awsdms_* rows -> diverted to the dms schema
    for vid in range(3):
        rows.append(
            ("insert", 30 + vid, "public", "awsdms_validation_failures",
             '{"vid":{"N":"%d"}}' % vid,
             '{"vid":{"N":"%d"},"detail":{"S":"err%d"}}' % (vid, vid), 0)
        )
    # a table nobody registered
    rows.append(
        ("insert", 40, "public", "mystery",
         '{"mid":{"N":"1"}}', '{"mid":{"N":"1"}}', 0)
    )
    return spark.createDataFrame(
        rows,
        "op string, commit_seq long, schema_name string, table_name string,"
        " keys_json string, image string, batch_id long",
    )


def _targets(spark, tmp_path):
    def mk(name, key, img):
        return TableTarget(
            KeyedLakeTable.create(
                spark, str(tmp_path / name), key_schema={key: "double"},
                n_buckets=2,
            ),
            PipelineConfig(keys=[key], image_columns=img,
                           discover_columns=False),
        )

    return {
        ("public", "users"): mk("users", "uid", {"uid": "N", "name": "S"}),
        ("public", "orders"): mk("orders", "oid", {"oid": "N", "amount": "N"}),
        ("dms", "awsdms_validation_failures"): mk(
            "dmsval", "vid", {"vid": "N", "detail": "S"}
        ),
    }


def test_fanout_routes_folds_and_merges(spark, tmp_path):
    targets = _targets(spark, tmp_path)
    pipe = MultiTablePipeline(
        spark, targets, checkpoint_dir=str(tmp_path / "ckpt"),
        unknown_table_dlq=str(tmp_path / "dlq"),
    )
    m = pipe.run_replay(_mk_events(spark))[0]

    users = {
        int(r["uid"]): r["name"]
        for r in targets[("public", "users")].table.read().collect()
    }
    assert users == {0: "u0", 1: "u1", 2: "u2", 3: "u3-upd", 4: "u4",
                     6: "u6", 7: "u7"}  # 5 deleted, 3 updated
    orders = {
        int(r["oid"]): int(r["amount"])
        for r in targets[("public", "orders")].table.read().collect()
    }
    assert orders == {i: 100 * i for i in range(5)}
    # awsdms_* rows landed in the dms-schema target (route diversion)
    dms = targets[("dms", "awsdms_validation_failures")].table.read()
    assert {r["detail"] for r in dms.collect()} == {"err0", "err1", "err2"}
    # unknown table: counted + DLQ'd, stream alive
    assert m["unknown_routes"] == ["public:mystery"]
    assert m["unknown_rows"] == 1
    assert os.path.isdir(str(tmp_path / "dlq"))
    # registry shared across targets, keyed schema:table
    assert pipe.registry.get("public", "users").extra_columns
    assert pipe.registry.get("dms", "awsdms_validation_failures").extra_columns


def test_fanout_replay_is_idempotent_per_sink(spark, tmp_path):
    targets = _targets(spark, tmp_path)
    pipe = MultiTablePipeline(spark, targets)
    events = _mk_events(spark)
    pipe.run_replay(events)
    before = {
        key: sorted(map(tuple, t.table.read().collect()))
        for key, t in targets.items()
    }
    # full redelivery of the same batch id: every sink skips (applied id)
    m = pipe.run_replay(events)[0]
    assert all(v.get("skipped") for v in m["tables"].values())
    after = {
        key: sorted(map(tuple, t.table.read().collect()))
        for key, t in targets.items()
    }
    assert before == after


def test_fanout_partial_crash_resumes_per_sink(spark, tmp_path):
    """Crash after table A merged, before table B: replay applies B and
    skips A — exactly-once composes per sink."""
    targets = _targets(spark, tmp_path)
    pipe = MultiTablePipeline(spark, targets)
    events = _mk_events(spark)

    orders_table = targets[("public", "orders")].table
    real_merge = orders_table.merge
    calls = {"n": 0}

    def exploding_merge(*a, **kw):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash mid-fanout")
        return real_merge(*a, **kw)

    orders_table.merge = exploding_merge
    import pytest

    with pytest.raises(RuntimeError, match="mid-fanout"):
        pipe.run_replay(events)
    # sorted route order: dms < public:orders — dms applied, orders did not
    assert targets[("dms", "awsdms_validation_failures")].table.read().count() == 3
    assert orders_table.read().count() == 0

    m = pipe.run_replay(events)[0]
    assert m["tables"]["dms:awsdms_validation_failures"].get("skipped")
    assert not m["tables"]["public:orders"].get("skipped")
    assert orders_table.read().count() == 5
    assert targets[("public", "users")].table.read().count() == 7


def test_fanout_control_events_scoped_to_their_table(spark, tmp_path):
    """DDL control events routed through the fan-out act on THEIR table
    only: a drop-table for public.users (arrival-order semantics: wipes
    inserts before it, keeps those at/after) must not touch public.orders
    or the dms target."""
    rows = []
    for uid in range(8):
        rows.append(
            ("insert", 10 + uid, "public", "users",
             '{"uid":{"N":"%d"}}' % uid,
             '{"uid":{"N":"%d"},"name":{"S":"u%d"}}' % (uid, uid), 0)
        )
    rows.append(("drop-table", 14, "public", "users", None, None, 0))
    for oid in range(5):
        rows.append(
            ("insert", 20 + oid, "public", "orders",
             '{"oid":{"N":"%d"}}' % oid,
             '{"oid":{"N":"%d"},"amount":{"N":"%d"}}' % (oid, 100 * oid), 0)
        )
    events = spark.createDataFrame(
        rows,
        "op string, commit_seq long, schema_name string, table_name string,"
        " keys_json string, image string, batch_id long",
    )

    def mk(name, key, img):
        return TableTarget(
            KeyedLakeTable.create(
                spark, str(tmp_path / name), key_schema={key: "double"},
                n_buckets=2,
            ),
            PipelineConfig(keys=[key], image_columns=img,
                           discover_columns=False, handle_control=True),
        )

    targets = {
        ("public", "users"): mk("users", "uid", {"uid": "N", "name": "S"}),
        ("public", "orders"): mk("orders", "oid", {"oid": "N", "amount": "N"}),
    }
    pipe = MultiTablePipeline(spark, targets)
    pipe.run_replay(events)

    users = sorted(
        int(r["uid"]) for r in targets[("public", "users")].table.read().collect()
    )
    # drop at seq 14 wipes uid 0..3 (seqs 10..13); uid 4..7 survive
    assert users == [4, 5, 6, 7]
    assert targets[("public", "orders")].table.read().count() == 5
    # registry reset applies to users only
    assert not pipe.registry.get("public", "users").exists
    assert pipe.registry.get("public", "orders").exists


def test_fanout_streaming_path_matches_batch(spark, tmp_path):
    """The fan-out's readStream/foreachBatch form lands the same per-table
    states as the batch replay."""
    events = _mk_events(spark).drop("batch_id")
    src_dir = str(tmp_path / "stream-src")
    events.repartition(2).write.mode("overwrite").parquet(src_dir)

    batch_targets = _targets(spark, tmp_path / "batch")
    MultiTablePipeline(spark, batch_targets).apply_batch(
        spark.read.parquet(src_dir), batch_id=0
    )

    stream_targets = _targets(spark, tmp_path / "stream")
    pipe = MultiTablePipeline(
        spark, stream_targets, checkpoint_dir=str(tmp_path / "ck")
    )
    q = pipe.run_stream(
        src_dir,
        schema=("op string, commit_seq long, schema_name string,"
                " table_name string, keys_json string, image string"),
    )
    q.awaitTermination(180)
    assert q.lastProgress is not None

    for key in batch_targets:
        a = sorted(map(tuple, batch_targets[key].table.read().collect()))
        b = sorted(map(tuple, stream_targets[key].table.read().collect()))
        assert a == b and a, key


def test_concurrent_matches_sequential(spark, tmp_path):
    """max_parallel_tables=4 (threaded merge submission, per-table
    scheduler pools) lands bit-identical per-table state and the same
    metric shape as the sequential path — the disjoint-sink concurrency
    must be pure speedup."""
    events = _mk_events(spark)

    seq_targets = _targets(spark, tmp_path / "seq")
    m_seq = MultiTablePipeline(
        spark, seq_targets, max_parallel_tables=1
    ).run_replay(events)[0]

    con_targets = _targets(spark, tmp_path / "con")
    m_con = MultiTablePipeline(
        spark, con_targets, max_parallel_tables=4
    ).run_replay(events)[0]

    assert sorted(m_seq["tables"]) == sorted(m_con["tables"])
    assert m_seq["unknown_rows"] == m_con["unknown_rows"] == 1
    for key in seq_targets:
        a = sorted(map(tuple, seq_targets[key].table.read().collect()))
        b = sorted(map(tuple, con_targets[key].table.read().collect()))
        assert a == b and a, key


def test_fanout_dlq_write_is_replay_idempotent(spark, tmp_path):
    """Re-applying a batch (crash-replay) must not duplicate dead-letter
    rows: the DLQ write is batch_id-scoped + overwrite."""
    events = _mk_events(spark)
    targets = _targets(spark, tmp_path)
    dlq = str(tmp_path / "dlq")
    pipe = MultiTablePipeline(spark, targets, unknown_table_dlq=dlq)
    pipe.apply_batch(events.drop("batch_id"), batch_id=0)
    pipe.apply_batch(events.drop("batch_id"), batch_id=0)  # replayed batch
    assert spark.read.parquet(dlq).count() == 1


def test_fanout_dlq_readable_when_batch_carries_batch_id_column(spark, tmp_path):
    """A direct apply_batch caller often keeps the envelope's batch_id
    column; the DLQ layout partitions by batch_id, so an identically-named
    data column must be renamed or every later DLQ read throws a
    duplicate-column AnalysisException."""
    events = _mk_events(spark)  # carries a batch_id data column
    targets = _targets(spark, tmp_path)
    dlq = str(tmp_path / "dlq")
    pipe = MultiTablePipeline(spark, targets, unknown_table_dlq=dlq)
    pipe.apply_batch(events, batch_id=7)
    got = spark.read.parquet(dlq)
    assert got.count() == 1
    assert "src_batch_id" in got.columns and "batch_id" in got.columns


def test_shared_config_instance_not_aliased(spark, tmp_path):
    """One PipelineConfig instance shared across targets must not collapse
    every pipeline onto the last-registered schema:table identity."""
    shared = PipelineConfig(keys=["uid"], image_columns={"uid": "N"},
                            discover_columns=False)

    def mk(name):
        return TableTarget(
            KeyedLakeTable.create(
                spark, str(tmp_path / name), key_schema={"uid": "double"},
                n_buckets=2,
            ),
            shared,
        )

    targets = {("public", "a"): mk("a"), ("public", "b"): mk("b")}
    pipe = MultiTablePipeline(spark, targets)
    assert pipe.pipelines[("public", "a")].cfg.table_name == "a"
    assert pipe.pipelines[("public", "b")].cfg.table_name == "b"
    # the caller's object is untouched
    assert shared.table_name == PipelineConfig(
        keys=["uid"], image_columns={"uid": "N"}
    ).table_name


def test_fanout_null_routed_envelopes_are_dead_lettered(spark, tmp_path):
    """An envelope with a NULL schema or table name must be counted and
    dead-lettered like any other unknown route — not silently dropped
    (plain == against a NULL route yields NULL and filters nothing)."""
    rows = [
        ("insert", 1, "public", "users", '{"uid":{"N":"1"}}',
         '{"uid":{"N":"1"},"name":{"S":"u1"}}', 0),
        ("insert", 2, None, None, '{"x":{"N":"9"}}', '{"x":{"N":"9"}}', 0),
        ("insert", 3, "public", None, '{"y":{"N":"9"}}', '{"y":{"N":"9"}}', 0),
    ]
    events = spark.createDataFrame(
        rows,
        "op string, commit_seq long, schema_name string, table_name string,"
        " keys_json string, image string, batch_id long",
    )
    targets = {
        ("public", "users"): TableTarget(
            KeyedLakeTable.create(
                spark, str(tmp_path / "users"), key_schema={"uid": "double"},
                n_buckets=2,
            ),
            PipelineConfig(keys=["uid"], image_columns={"uid": "N", "name": "S"},
                           discover_columns=False),
        )
    }
    pipe = MultiTablePipeline(
        spark, targets, unknown_table_dlq=str(tmp_path / "dlq")
    )
    m = pipe.run_replay(events)[0]
    assert m["unknown_rows"] == 2
    assert spark.read.parquet(str(tmp_path / "dlq")).count() == 2
    assert targets[("public", "users")].table.read().count() == 1
