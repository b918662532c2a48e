"""Kafka-wire transport seam: the engine ingests a broker-shaped stream
(key/value/topic/partition/offset/timestamp) through the REAL
readStream → foreachBatch path via a Spark 4 Python Data Source, with the
engine checkpointing the reader's offsets exactly as it would Kafka's.
Pins that swapping the file source for a wire source is configuration,
not engine surgery (SURVEY.md §2 S1; the kafka connector jar itself is
absent in this sandbox)."""

from __future__ import annotations

from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.sources.kafka_shaped import (
    SIM_IMAGE_COLUMNS,
    make_kafka_cdc_decoder,
    register,
    simulated_wire_df,
)
from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig


def _cfg():
    return PipelineConfig(
        keys=["uid"],
        image_columns=SIM_IMAGE_COLUMNS,
        discover_columns=False,
        decoder=make_kafka_cdc_decoder(SIM_IMAGE_COLUMNS),
    )


def _table(spark, path):
    return KeyedLakeTable.create(
        spark, str(path), key_schema={"uid": "double"}, n_buckets=2
    )


def test_kafka_shaped_stream_matches_batch(spark, tmp_path):
    """Multiple offset-ranged micro-batches off the wire source land the
    same final state as one batch apply of the identical events (offsets
    ascend in commit order, as a single-partition topic delivers)."""
    register(spark)
    opts = {"n_events": "2400", "rows_per_batch": "700",
            "n_keys": "150", "seed": "11"}

    stream_table = _table(spark, tmp_path / "stream")
    pipe = CDCPipeline(
        spark, stream_table, _cfg(), checkpoint_dir=str(tmp_path / "ck")
    )
    q = pipe.run_stream(
        None, source_format="cdc_kafka_sim", source_options=opts,
        available_now=False,
    )
    q.processAllAvailable()
    q.stop()
    assert q.lastProgress is not None
    applied = [m for m in pipe.metrics if not m.get("skipped")]
    assert len(applied) >= 3  # the 2400 events arrived as offset ranges

    batch_table = _table(spark, tmp_path / "batch")
    CDCPipeline(spark, batch_table, _cfg()).apply_batch(
        simulated_wire_df(spark, opts), batch_id=0
    )
    a = sorted(map(tuple, stream_table.read().collect()))
    b = sorted(map(tuple, batch_table.read().collect()))
    assert a == b and a


def test_kafka_multi_partition_composite_offsets(spark, tmp_path):
    """topic_partitions=4: the source checkpoints Kafka's REAL offset
    shape — one independent offset per topic partition — keys pinned to
    partitions, ordering only within a partition.  The streamed state must
    equal the batch apply of the same events, and the committed offset
    must be the composite dict."""
    import ast

    register(spark)
    opts = {"n_events": "2400", "rows_per_batch": "800", "n_keys": "160",
            "seed": "31", "topic_partitions": "4"}

    stream_table = _table(spark, tmp_path / "stream")
    pipe = CDCPipeline(
        spark, stream_table, _cfg(), checkpoint_dir=str(tmp_path / "ck")
    )
    q = pipe.run_stream(
        None, source_format="cdc_kafka_sim", source_options=opts,
        available_now=False,
    )
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()
    assert progress is not None
    # the python-data-source offset dict surfaces as a dict repr here
    end = ast.literal_eval(progress["sources"][0]["endOffset"])
    assert set(end) == {"0", "1", "2", "3"}, end  # composite offset shape
    applied = [m for m in pipe.metrics if not m.get("skipped")]
    assert len(applied) >= 2

    batch_table = _table(spark, tmp_path / "batch")
    CDCPipeline(spark, batch_table, _cfg()).apply_batch(
        simulated_wire_df(spark, opts), batch_id=0
    )
    a = sorted(map(tuple, stream_table.read().collect()))
    b = sorted(map(tuple, batch_table.read().collect()))
    assert a == b and a


def test_kafka_shaped_resume_from_checkpoint(spark, tmp_path):
    """Kill the stream mid-topic, restart with the same checkpoint: the
    engine resumes from the committed wire offset and the final state has
    no duplicates or gaps (exactly-once across the restart).

    A restarted reader instance learns the committed position from the
    first planned batch's start offsets (``_fast_forward``) — its
    incremental ``latestOffset`` never regresses past that first (empty)
    batch and no committed range is re-emitted.  The drain still polls
    for convergence rather than trusting one ``processAllAvailable``:
    that first empty catch-up batch can make a single drain call return
    before new offsets are discovered.
    """
    import time

    register(spark)
    # 8 micro-batches: enough runway that the kill lands mid-topic even
    # on a fast machine (first-commit detection polls at 0.5 s)
    opts = {"n_events": "2000", "rows_per_batch": "250",
            "n_keys": "120", "seed": "23"}

    batch_table = _table(spark, tmp_path / "batch")
    CDCPipeline(spark, batch_table, _cfg()).apply_batch(
        simulated_wire_df(spark, opts), batch_id=0
    )
    expected = sorted(map(tuple, batch_table.read().collect()))
    assert expected

    table = _table(spark, tmp_path / "tbl")
    ck = str(tmp_path / "ck")

    pipe1 = CDCPipeline(spark, table, _cfg(), checkpoint_dir=ck)
    q1 = pipe1.run_stream(
        None, source_format="cdc_kafka_sim", source_options=opts,
        available_now=False,
    )
    # let at least one micro-batch commit, then kill mid-stream
    deadline = time.time() + 120
    while not any(not m.get("skipped") for m in pipe1.metrics):
        assert time.time() < deadline, "no micro-batch committed before kill"
        q1.awaitTermination(0.5)
    q1.stop()
    assert sorted(map(tuple, table.read().collect())) != expected, (
        "stream finished before the kill — shrink rows_per_batch"
    )

    # fresh reader instance, same checkpoint: offsets resume, merges skip
    # anything already applied
    pipe2 = CDCPipeline(spark, table, _cfg(), checkpoint_dir=ck)
    q2 = pipe2.run_stream(
        None, source_format="cdc_kafka_sim", source_options=opts,
        available_now=False,
    )
    deadline = time.time() + 180
    while time.time() < deadline:
        if sorted(map(tuple, table.read().collect())) == expected:
            break
        time.sleep(2)
    q2.stop()
    assert sorted(map(tuple, table.read().collect())) == expected


def test_kafka_fanout_wire_resume(spark, tmp_path):
    """EP1 x S1 composition under failure: ONE heterogeneous wire topic
    (route fields inside ``value``, keys pinned to topic partitions) fans
    out through ``MultiTablePipeline.run_stream``; kill mid-topic, restart
    with the same checkpoint — composite offsets resume and the final
    state across ALL sinks equals a batch apply of the same events
    (exactly-once across every table under the wire transport)."""
    import time

    from commons_codec_spark.sources.kafka_shaped import unwrap_wire_envelope
    from commons_codec_spark.streaming.fanout import (
        MultiTablePipeline,
        TableTarget,
    )

    register(spark)
    # n_tables coprime to topic_partitions: keys are pinned to partitions,
    # so equal counts would make the route congruent with the partition and
    # hide route-by-partition bugs from the state comparison
    opts = {"n_events": "2400", "rows_per_batch": "300", "n_keys": "120",
            "seed": "57", "topic_partitions": "3", "n_tables": "2"}

    def mk_targets(prefix):
        return {
            ("public", f"t{i}"): TableTarget(
                _table(spark, tmp_path / f"{prefix}{i}"),
                PipelineConfig(keys=["uid"], image_columns=SIM_IMAGE_COLUMNS,
                               discover_columns=False),
            )
            for i in range(2)
        }

    # batch twin: same events, one apply, per-table expected state
    batch_targets = mk_targets("b")
    with MultiTablePipeline(spark, batch_targets) as bp:
        bp.apply_batch(
            unwrap_wire_envelope(routed=True)(simulated_wire_df(spark, opts)),
            batch_id=0,
        )
    expected = {
        k: sorted(map(tuple, t.table.read().collect()))
        for k, t in batch_targets.items()
    }
    assert all(expected.values())

    targets = mk_targets("s")
    ck = str(tmp_path / "ck")

    def snapshot():
        return {
            k: sorted(map(tuple, t.table.read().collect()))
            for k, t in targets.items()
        }

    with MultiTablePipeline(spark, targets, checkpoint_dir=ck) as p1:
        q1 = p1.run_stream(
            None, source_format="cdc_kafka_sim", source_options=opts,
            available_now=False,
            stream_transform=unwrap_wire_envelope(routed=True),
        )
        deadline = time.time() + 120
        while not p1.metrics:
            assert time.time() < deadline, "no micro-batch before kill"
            q1.awaitTermination(0.5)
        q1.stop()
    assert snapshot() != expected, (
        "stream finished before the kill — shrink rows_per_batch"
    )

    with MultiTablePipeline(spark, targets, checkpoint_dir=ck) as p2:
        q2 = p2.run_stream(
            None, source_format="cdc_kafka_sim", source_options=opts,
            available_now=False,
            stream_transform=unwrap_wire_envelope(routed=True),
        )
        deadline = time.time() + 180
        while time.time() < deadline:
            if snapshot() == expected:
                break
            time.sleep(2)
        q2.stop()
    assert snapshot() == expected


def test_kafka_wire_schema_evolution(spark, tmp_path):
    """North-rule additive column over the wire transport: images carry a
    new ``lang`` key from mid-topic onward; streamed discovery must widen
    the schema mid-stream and the final state must equal a batch apply of
    the same events (pre-cutover survivors read NULL lang)."""
    from commons_codec_spark.sources.kafka_shaped import unwrap_wire_envelope

    register(spark)
    opts = {"n_events": "1200", "rows_per_batch": "400", "n_keys": "90",
            "seed": "71", "evolve_from": "600"}

    def cfg():
        return PipelineConfig(
            keys=["uid"], image_columns=dict(SIM_IMAGE_COLUMNS),
            discover_columns=True,
        )

    table = _table(spark, tmp_path / "stream")
    pipe = CDCPipeline(
        spark, table, cfg(), checkpoint_dir=str(tmp_path / "ck")
    )
    q = pipe.run_stream(
        None, source_format="cdc_kafka_sim", source_options=opts,
        available_now=False, stream_transform=unwrap_wire_envelope(),
    )
    q.processAllAvailable()
    q.stop()
    applied = [m for m in pipe.metrics if not m.get("skipped")]
    assert len(applied) >= 2  # the cutover landed in a LATER micro-batch
    assert "lang" in pipe._image_columns  # discovery widened mid-stream

    batch_table = _table(spark, tmp_path / "batch")
    CDCPipeline(spark, batch_table, cfg()).apply_batch(
        unwrap_wire_envelope()(simulated_wire_df(spark, opts)), batch_id=0
    )
    a = sorted(map(tuple, table.read().collect()))
    b = sorted(map(tuple, batch_table.read().collect()))
    assert a == b and a

    langs = {r.lang for r in table.read().select("lang").distinct().collect()}
    assert None in langs and len(langs) > 1  # pre-cutover NULLs + evolved rows
