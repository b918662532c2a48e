"""spark-submit entrypoint: replay a CDC envelope log into a keyed lake table.

Cluster usage (the north rule's operating mode)::

    cd /root/repo && zip -r /tmp/ccs.zip commons_codec_spark
    spark-submit --py-files /tmp/ccs.zip scripts/run_replay_job.py \
        --events  s3://bucket/cdc-envelopes/           \
        --table   s3://bucket/lake/source_code         \
        --checkpoint s3://bucket/ckpt/source_code      \
        --buckets 4096 --stream

Local smoke run (generates a synthetic log first)::

    python scripts/run_replay_job.py --selftest

Batch mode (default) replays `--events` micro-batch by micro-batch keyed on
the envelope's `batch_id` column; `--stream` tails the directory with
Structured Streaming instead (checkpointed offsets, availableNow).  Both
paths share the same decode → fold → ordering-guarded merge and are
exactly-once under kill-and-resume.  Per-batch metrics (events/sec, op
histogram, dlq, touched buckets) stream to stdout and to
`<checkpoint>/metrics.jsonl`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--events", help="envelope log dir (parquet)")
    p.add_argument("--table", help="lake table root")
    p.add_argument("--checkpoint", help="checkpoint dir (offsets + registry + metrics)")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--keys", default="repo,path")
    p.add_argument("--stream", action="store_true", help="tail with Structured Streaming")
    p.add_argument(
        "--dialect", choices=["dynamodb", "dms", "mongodb", "auto"], default="dynamodb",
        help="envelope dialect: DynamoDB descriptor images (default), raw DMS "
             "envelopes (expects an `envelope` column), or MongoDB change "
             "streams (expects an `event` column keyed on oid)",
    )
    p.add_argument("--handle-control", action="store_true")
    p.add_argument(
        "--salt-chunks", default=None,
        type=lambda v: v if v == "auto" else int(v),
        help="skew salting: an int pins the chunk count (blanket), "
             "'auto' measures per-key skew in the prescan and salts only "
             "the hot keys (preferred — see PipelineConfig.salt_chunks)",
    )
    p.add_argument("--cpus", type=int, default=None, help="local mode only")
    p.add_argument("--selftest", action="store_true", help="generate a synthetic log and replay it")
    p.add_argument(
        "--changelog", action="store_true",
        help="create the table with a change-data-feed (changes/v{N}; "
             "read back with KeyedLakeTable.read_changes/stream_changes)",
    )
    p.add_argument(
        "--replicate-from", metavar="SRC_TABLE",
        help="instead of decoding envelopes, tail SRC_TABLE's change feed "
             "and merge it into --table (downstream replica); --events is "
             "not required",
    )
    p.add_argument(
        "--expire-changes-before", type=int, metavar="V",
        help="maintenance: drop change-feed versions < V after the run",
    )
    p.add_argument(
        "--compact-tombstones", type=int, metavar="SEQ", default=None,
        help="maintenance: drop delete tombstones with seq older than SEQ "
             "(the source's out-of-order horizon) after the replay",
    )
    p.add_argument(
        "--vacuum-keep", type=int, default=None, metavar="N",
        help="maintenance: reclaim data dirs unreferenced by the last N "
             "snapshots after the replay",
    )
    args = p.parse_args()

    from commons_codec_spark.lake.table import KeyedLakeTable
    from commons_codec_spark.session import get_spark
    from commons_codec_spark.sources.eventlog import SOURCE_CODE_COLUMNS
    from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    spark = get_spark(app_name="cdc-replay", cpus=args.cpus)

    if args.selftest:
        from commons_codec_spark.sources.eventlog import generate_event_log

        work = tempfile.mkdtemp(prefix="ccs-job-")
        args.events = os.path.join(work, "events")
        args.table = os.path.join(work, "table")
        args.checkpoint = os.path.join(work, "ckpt")
        generate_event_log(
            spark, n_events=200_000, n_keys=20_000, n_repos=200, seed=1,
            batch_size=50_000,
        ).write.mode("overwrite").partitionBy("batch_id").parquet(args.events)

    if args.replicate_from:
        if not args.table:
            p.error("--replicate-from needs --table for the replica")
    elif not (args.events and args.table and args.checkpoint):
        p.error("--events, --table and --checkpoint are required (or --selftest)")

    keys = args.keys.split(",")
    image_columns = dict(SOURCE_CODE_COLUMNS)
    decoder = None
    if args.dialect == "auto":
        from commons_codec_spark.functions.dynamodb_auto import make_auto_decoder

        # descriptor images with UNKNOWN schema: infer per batch, pin the
        # spec, widen additively; only the key columns are declared
        image_columns = {k: "S" for k in keys}
        decoder = make_auto_decoder()
    elif args.dialect == "dms":
        from commons_codec_spark.functions.dms import make_dms_decoder

        decoder = make_dms_decoder(
            {c: "string" for c in SOURCE_CODE_COLUMNS}, keys=keys
        )
    elif args.dialect == "mongodb":
        from commons_codec_spark.functions.mongodb import make_mongo_decoder

        # Mongo documents are keyed on oid; the change-stream decoder emits
        # oid + the payload columns below — image_columns must match that
        # output exactly (the fold reads payload_cols from it), so repo/path
        # are NOT payload here (they identify DynamoDB-dialect tables only).
        keys = ["oid"]
        payload = {
            c: m for c, m in SOURCE_CODE_COLUMNS.items() if c not in ("repo", "path")
        }
        image_columns = {"oid": "S", **payload}
        decoder = make_mongo_decoder(
            {c: ("bigint" if m == "N" else "string") for c, m in payload.items()}
        )
    if os.path.exists(os.path.join(args.table, "_meta.json")):
        table = KeyedLakeTable(spark, args.table)
    else:
        table = KeyedLakeTable.create(
            spark, args.table,
            key_schema={k: "string" for k in keys},
            n_buckets=args.buckets,
            changelog=args.changelog,
        )
    pipe = CDCPipeline(
        spark,
        table,
        PipelineConfig(
            keys=keys,
            image_columns=image_columns,
            salt_chunks=args.salt_chunks,
            handle_control=args.handle_control,
            decoder=decoder,
        ),
        checkpoint_dir=args.checkpoint,
    )

    if args.replicate_from:
        from commons_codec_spark.operators.cdc_fold import compose_net_changes

        src = KeyedLakeTable(spark, args.replicate_from)
        head = src.version()
        # the whole feed range composes to one net row per key (fold
        # associativity) and applies in ONE merge
        applied = 0
        try:
            changes = src.read_changes(1, head)
        except ValueError:
            changes = None  # no change versions at all
        if changes is not None:
            table.merge(compose_net_changes(changes, keys=list(table.keys)))
            applied = head
        print(json.dumps({
            "replicated_from": args.replicate_from,
            "source_version": head,
            "change_versions_applied": applied,
            "final_rows": table.read().count(),
        }))
        if args.expire_changes_before is not None:
            src.vacuum_changes(args.expire_changes_before)
        spark.stop()
        return

    if args.stream:
        events_schema = spark.read.parquet(args.events).drop("batch_id").schema
        ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in events_schema)
        q = pipe.run_stream(args.events, schema=ddl)
        q.awaitTermination()
    else:
        pipe.run_replay(spark.read.parquet(args.events))

    if args.compact_tombstones is not None:
        print(json.dumps(table.compact_tombstones(args.compact_tombstones)))
    if args.vacuum_keep is not None:
        table.vacuum(keep_last=args.vacuum_keep)
    if args.expire_changes_before is not None:
        table.vacuum_changes(args.expire_changes_before)

    for m in pipe.metrics:
        print(json.dumps(m))
    print(
        json.dumps(
            {
                "final_rows": table.read().count(),
                "version": table.version(),
                "applied_batches": len(table.applied_batch_ids()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
