"""Physical-plan hygiene: the properties that matter at 100 TB.

These assertions pin the *shape* of the plans, not their results:
the hot decode path must stay JVM-side (no EvalPython), scans must receive
pushed filters and pruned schemas, and the fold must not degrade to a
Python round-trip.
"""

import pyspark.sql.functions as F

from commons_codec_spark.functions.dynamodb import compile_direct_decoder
from commons_codec_spark.operators.cdc_fold import fold_net_changes
from commons_codec_spark.sources.eventlog import (
    SOURCE_CODE_COLUMNS,
    generate_event_log,
)

PAYLOAD = [c for c in SOURCE_CODE_COLUMNS if c not in ("repo", "path")]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decode_and_fold_stay_jvm_side(spark):
    events = generate_event_log(
        spark, n_events=500, n_keys=50, n_repos=4, seed=3, batch_size=500
    )
    src = events.withColumn("image", F.coalesce("image", "keys_json"))
    decoded = compile_direct_decoder(src, "image", SOURCE_CODE_COLUMNS)
    net = fold_net_changes(decoded, ["repo", "path"], PAYLOAD)
    plan = _plan(net)
    assert "EvalPython" not in plan, "decode/fold fell back to a Python UDF"
    assert "WindowGroupLimit" in plan or "Window" in plan  # closed-form fold shape


def test_merge_join_reuses_fold_partitioning(spark, tmp_path):
    """The merge's full-outer join must run on the keys alone so the fold's
    window exchange is REUSED: exactly two hash exchanges in the whole
    decode→fold→join plan (events into the window, current-table scan into
    the join) — a third would mean the net side re-shuffles its payload."""
    from commons_codec_spark.lake.table import BUCKET_COL, KeyedLakeTable

    events = generate_event_log(
        spark, n_events=1000, n_keys=100, n_repos=4, seed=9, batch_size=1000
    )
    src = events.withColumn("image", F.coalesce("image", "keys_json"))
    decoded = compile_direct_decoder(src, "image", SOURCE_CODE_COLUMNS)
    net = fold_net_changes(decoded, ["repo", "path"], PAYLOAD)
    table = KeyedLakeTable.create(
        spark, str(tmp_path / "t"), {"repo": "string", "path": "string"}, n_buckets=8
    )
    table.merge(net, batch_id=0)  # seed so the current side scans parquet

    current = table.read(include_tombstones=True)
    joined = current.alias("t").join(
        net.withColumn(BUCKET_COL, table._bucket_expr()).drop(BUCKET_COL).alias("s"),
        on=["repo", "path"],
        how="full_outer",
    )
    plan = _plan(joined)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "EvalPython" not in plan


def test_scan_pushdown_and_pruning(spark, tmp_path):
    out = str(tmp_path / "events-parquet")
    generate_event_log(
        spark, n_events=2000, n_keys=100, n_repos=4, seed=5, batch_size=500
    ).write.partitionBy("batch_id").parquet(out)

    df = spark.read.parquet(out)
    q = df.filter(F.col("op") == "insert").select("event_id", "commit_seq")
    plan = _plan(q)
    # predicate reaches the parquet scan
    assert "PushedFilters: [" in plan and "op" in plan.split("PushedFilters")[1][:80]
    # column pruning: content-bearing `image` must not be read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "image" not in read_schema and "event_id" in read_schema

    # partition pruning on the micro-batch column
    pruned = df.filter(F.col("batch_id") == 1)
    pplan = _plan(pruned)
    assert "PartitionFilters: [" in pplan and "batch_id" in pplan.split("PartitionFilters")[1][:120]


def test_dedup_and_ann_plans_have_no_cartesian(spark):
    """The banded/blocked similarity paths must never degrade to an
    all-pairs product: no CartesianProduct / BroadcastNestedLoopJoin in
    minhash-LSH, simhash blocking, or LSH top-k — the property that keeps
    them alive at 10^9 documents."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("dedup_minhash_lsh", "dedup_simhash", "similarity_lsh_topk"):
        plan = _plan(qs[name](spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_unigram_logprob_join_is_broadcast(spark):
    """The token→frequency join key is Zipf-skewed ("the" is a hot key at
    100 TB), so the plan is pinned to a broadcast hash join over the
    vocabulary-sized frequency side — a sort-merge fallback would shuffle
    the full token stream onto the skewed key."""
    import __spark_entry__ as entrymod

    plan = _plan(
        entrymod.queries()["text_unigram_logprob"](spark, "/root/testdata/sf0.001")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kafka_wire_decode_stays_jvm_side(spark):
    """The Kafka value→envelope→typed-columns decode chain is one
    from_json + the compiled image decode — no Python workers."""
    from commons_codec_spark.sources.kafka_shaped import (
        SIM_IMAGE_COLUMNS,
        make_kafka_cdc_decoder,
        simulated_wire_df,
    )

    wire = simulated_wire_df(
        spark, {"n_events": "300", "n_keys": "40", "seed": "3"}
    )
    decoded = make_kafka_cdc_decoder(SIM_IMAGE_COLUMNS)(wire)
    plan = _plan(decoded)
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_wire_unwrap_chain_stays_jvm_side(spark):
    """The contract queries' wire path — unwrap_wire_envelope on the
    stream, then the pipeline's DEFAULT compiled image decode — is pure
    column expressions end-to-end (routed and unrouted): no Python
    workers between the source rows and the fold."""
    from commons_codec_spark.functions.dynamodb import compile_direct_decoder
    from commons_codec_spark.sources.kafka_shaped import (
        SIM_IMAGE_COLUMNS,
        simulated_wire_df,
        unwrap_wire_envelope,
    )

    for routed in (False, True):
        opts = {"n_events": "300", "n_keys": "40", "seed": "3"}
        if routed:
            opts["n_tables"] = "3"
        env = unwrap_wire_envelope(routed=routed)(
            simulated_wire_df(spark, opts)
        )
        decoded = compile_direct_decoder(env, "image", SIM_IMAGE_COLUMNS)
        plan = _plan(decoded)
        assert "EvalPython" not in plan and "MapInPandas" not in plan, routed


def test_new_jvm_contract_queries_are_python_free(spark):
    """The compiled decode variants must never regress to a Python round
    trip: universal_decode_inferred, corpus_curation, and the JVM halves of
    the collapsed both-path queries (tts_ttn, sensor_community, Mongo
    DIRECT) — their contract queries run BOTH paths in one union, so the
    JVM half is plan-checked directly here."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("universal_decode_inferred", "corpus_curation"):
        plan = _plan(qs[name](spark, "/root/testdata/sf0.001"))
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name

    from commons_codec_spark.functions.telemetry import (
        decode_sensor_community_jvm,
        decode_tts_ttn_jvm,
    )

    uplink = spark.createDataFrame(
        [('{"end_device_ids":{"device_id":"dev-1"},"uplink_message":'
          '{"decoded_payload":{"reading_cents":5},"settings":{"data_rate":'
          '{"lora":{"bandwidth":125000,"spreading_factor":7}},"frequency":'
          '"868100000"},"f_cnt":1,"rx_metadata":[{"gateway_ids":'
          '{"gateway_id":"gw0"},"rssi":-40,"snr":5}]}}',)],
        "payload string",
    )
    plan = _plan(decode_tts_ttn_jvm(uplink))
    assert "EvalPython" not in plan and "MapInPandas" not in plan

    sc = spark.createDataFrame(
        [('{"sensordatavalues":[{"value_type":"P1","value":"7"}]}',)],
        "payload string",
    )
    plan = _plan(decode_sensor_community_jvm(sc, "payload"))
    assert "EvalPython" not in plan and "MapInPandas" not in plan

    from commons_codec_spark.functions.mongodb import compile_mongo_direct_decoder

    env = spark.createDataFrame(
        [('{"operationType":"insert",'
          '"documentKey":{"_id":{"$oid":"aaaaaaaaaaaaaaaaaaaaaaaa"}},'
          '"fullDocument":{"event_id":{"$numberLong":"1"}}}',)],
        "event string",
    )
    plan = _plan(
        compile_mongo_direct_decoder(env, "event", {"event_id": "long"})
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
