"""Structured Streaming shell: readStream file-tail → foreachBatch → merge.

Covers the engine lifecycle the reference only sketches as a blocking
change-stream cursor loop (`/root/reference/examples/mongodb_cdc_cratedb.py:50-61`):
checkpointed offsets + idempotent lake commits = exactly-once, including a
mid-stream stop ("kill") and a resume that must neither duplicate nor drop.
"""

import json
import os
import time

import pyspark.sql.functions as F

from commons_codec_spark.functions import dynamodb as ddb
from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.oracle import replay_oracle, state_hash
from commons_codec_spark.sources.eventlog import (
    SOURCE_CODE_COLUMNS,
    generate_event_log,
)
from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig

KEYS = ["repo", "path"]
COLUMNS = ["repo", "path", "commit", "lang", "content", "size", "_seq"]


def _write_stream_dir(spark, events, out_dir: str, n_files: int) -> str:
    """One flat parquet file per micro-batch id, so maxFilesPerTrigger=1
    replays the log file-by-file (arrival order = commit order)."""
    import glob
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    for bid in range(n_files):
        staging = os.path.join(out_dir, f"_stage{bid}")
        (
            events.filter(F.col("batch_id") == bid)
            .drop("batch_id")
            .repartition(1)
            .write.mode("overwrite")
            .parquet(staging)
        )
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out_dir, f"b{bid:04d}.parquet"))
        shutil.rmtree(staging)
    return out_dir


def _oracle_state(events_rows):
    evs = []
    for r in events_rows:
        image = r.image if r.image is not None else r.keys_json
        decoded = {k: ddb.deserialize(v) for k, v in json.loads(image).items()}
        evs.append(
            {"op": r.op, "event_id": r.event_id, "commit_seq": r.commit_seq, **decoded}
        )
    state = replay_oracle(evs, KEYS)
    for (repo, path), row in state.items():
        row.setdefault("repo", repo), row.setdefault("path", path)
    return state


def _schema_ddl(events):
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in events.drop("batch_id").schema.fields
    )


def _pipeline(spark, tmp_path, name):
    table = KeyedLakeTable.create(
        spark,
        str(tmp_path / f"{name}-tbl"),
        key_schema={"repo": "string", "path": "string"},
        n_buckets=4,
    )
    cfg = PipelineConfig(keys=KEYS, image_columns=SOURCE_CODE_COLUMNS)
    pipe = CDCPipeline(spark, table, cfg, checkpoint_dir=str(tmp_path / f"{name}-ckpt"))
    return table, pipe


def test_stream_end_to_end(spark, tmp_path):
    events = generate_event_log(
        spark, n_events=2000, n_keys=200, n_repos=8, seed=11, batch_size=500
    ).cache()
    src = _write_stream_dir(spark, events, str(tmp_path / "stream-in"), 4)
    table, pipe = _pipeline(spark, tmp_path, "e2e")

    q = pipe.run_stream(
        src, schema=_schema_ddl(events), max_files_per_trigger=1
    )
    q.awaitTermination(120)
    assert not q.isActive

    engine = [r.asDict() for r in table.read().collect()]
    oracle = _oracle_state(events.collect())
    assert len(engine) == len(oracle)
    assert state_hash(engine, COLUMNS) == state_hash(list(oracle.values()), COLUMNS)


def test_stream_kill_and_resume(spark, tmp_path):
    events = generate_event_log(
        spark, n_events=2000, n_keys=200, n_repos=8, seed=13, batch_size=500
    ).cache()
    src = _write_stream_dir(spark, events, str(tmp_path / "stream-kr"), 4)
    table, pipe = _pipeline(spark, tmp_path, "kr")

    # "crash": stop the query as soon as the first lake commit lands
    q = pipe.run_stream(src, schema=_schema_ddl(events), max_files_per_trigger=1)
    deadline = time.time() + 120
    while time.time() < deadline and not table.applied_batch_ids():
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    applied_before = set(table.applied_batch_ids())
    assert applied_before, "stream never committed a batch before the kill"

    # resume: same checkpoint + same table — offsets skip consumed files,
    # the lake's applied-batch-id log makes a replayed trigger a no-op
    pipe2 = CDCPipeline(
        spark,
        table,
        PipelineConfig(keys=KEYS, image_columns=SOURCE_CODE_COLUMNS),
        checkpoint_dir=pipe.checkpoint_dir,
    )
    q2 = pipe2.run_stream(src, schema=_schema_ddl(events), max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert not q2.isActive

    engine = [r.asDict() for r in table.read().collect()]
    # no duplicate keys
    keyed = {(r["repo"], r["path"]) for r in engine}
    assert len(keyed) == len(engine)
    oracle = _oracle_state(events.collect())
    assert state_hash(engine, COLUMNS) == state_hash(list(oracle.values()), COLUMNS)


def test_stream_auto_dialect_with_changelog(spark, tmp_path):
    """Structured Streaming x schema-inferring decoder x change-data-feed:
    the streamed table's CDF, replayed into a batch replica, reproduces
    the streamed final state exactly."""
    from commons_codec_spark.functions.dynamodb_auto import make_auto_decoder

    events = generate_event_log(
        spark, n_events=2000, n_keys=200, n_repos=8, seed=17, batch_size=500
    ).cache()
    src = _write_stream_dir(spark, events, str(tmp_path / "stream-ac"), 4)

    table = KeyedLakeTable.create(
        spark,
        str(tmp_path / "ac-tbl"),
        key_schema={"repo": "string", "path": "string"},
        n_buckets=4,
        changelog=True,
    )
    cfg = PipelineConfig(
        keys=KEYS,
        image_columns={"repo": "S", "path": "S"},  # rest inferred per batch
        decoder=make_auto_decoder(),
    )
    pipe = CDCPipeline(
        spark, table, cfg, checkpoint_dir=str(tmp_path / "ac-ckpt")
    )
    q = pipe.run_stream(src, schema=_schema_ddl(events), max_files_per_trigger=1)
    q.awaitTermination(120)
    assert not q.isActive

    # the stream matched the oracle...
    engine = [r.asDict() for r in table.read().collect()]
    oracle = _oracle_state(events.collect())
    assert len(engine) == len(oracle)
    assert state_hash(engine, COLUMNS) == state_hash(list(oracle.values()), COLUMNS)

    # ...and its change feed replays into a converging replica
    replica = KeyedLakeTable.create(
        spark,
        str(tmp_path / "ac-replica"),
        key_schema={"repo": "string", "path": "string"},
        n_buckets=4,
    )
    head = table._current_commit()["version"]
    for v in range(1, head + 1):
        try:
            replica.merge(table.read_changes(v, v).drop("_version"))
        except ValueError:
            continue
    rep = [r.asDict() for r in replica.read().collect()]
    assert state_hash(rep, COLUMNS) == state_hash(engine, COLUMNS)
