"""Benchmark driver: CDC replay throughput + per-query timings + scaling.

Prints ONE JSON line:

    {"metric": "cdc_replay_e2e_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "events": N, "events_per_sec": ...,
     "scaling": {"cpus_low": 8, "cpus_high": 32,
                 "events_per_sec_low": ..., "events_per_sec_high": ...,
                 "efficiency": ...}}

Headline = end-to-end decode->fold->merge replay of a deterministic
synthetic envelope log (written to parquet first; generation excluded from
timing) into a fresh bucketed lake table, at local[$SPARK_GRAFT_CPUS].

Scaling evidence (BASELINE.md): the same replay at local[LOW] and
local[HIGH] on the same parquet input; efficiency =
(tp_high / tp_low) / (HIGH / LOW).  Disable with SPARK_GRAFT_SCALING=0.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "8"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
SCALE_LOW = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "8"))
SEED = 42


def _sf_label(path: str) -> float:
    try:
        return float(os.path.basename(path.rstrip("/")).replace("sf", ""))
    except ValueError:
        return -1.0


def make_log(spark, out_dir: str) -> None:
    from commons_codec_spark.sources.eventlog import generate_event_log

    log = generate_event_log(
        spark,
        n_events=N_EVENTS,
        n_keys=max(N_EVENTS // 10, 64),
        n_repos=max(N_EVENTS // 1000, 8),
        seed=SEED,
        batch_size=max(N_EVENTS // N_BATCHES, 1),
    )
    # partition by micro-batch: each replay step prunes to its own files
    log.write.mode("overwrite").partitionBy("batch_id").parquet(out_dir)


def run_replay(spark, log_dir: str, work_dir: str, n_buckets: int = 64) -> dict:
    from commons_codec_spark.lake.table import KeyedLakeTable
    from commons_codec_spark.sources.eventlog import SOURCE_CODE_COLUMNS
    from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    events = spark.read.parquet(log_dir)
    table = KeyedLakeTable.create(
        spark,
        os.path.join(work_dir, "tbl"),
        key_schema={"repo": "string", "path": "string"},
        n_buckets=n_buckets,
    )
    pipe = CDCPipeline(
        spark,
        table,
        PipelineConfig(
            keys=["repo", "path"],
            image_columns=SOURCE_CODE_COLUMNS,
            discover_columns=False,  # schema known for the bench
        ),
        checkpoint_dir=os.path.join(work_dir, "ckpt"),
    )
    t0 = time.time()
    pipe.run_replay(events)
    wall = time.time() - t0
    n_rows = table.read().count()
    return {"wall_sec": round(wall, 3), "final_rows": n_rows}


def timed_queries(spark) -> dict:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        fn(spark, SF_DIR).count()
        out[name] = round(time.time() - t0, 3)
    return out


def session(cpus: int):
    from commons_codec_spark.session import get_spark

    return get_spark(app_name=f"bench-{cpus}", cpus=cpus,
                     shuffle_partitions=max(cpus, 8))


def main() -> None:
    work = tempfile.mkdtemp(prefix="ccs-bench-")
    log_dir = os.path.join(work, "eventlog")
    result: dict = {"sf": _sf_label(SF_DIR), "events": N_EVENTS}

    # --- headline at CPUS
    spark = session(CPUS)
    make_log(spark, log_dir)
    head = run_replay(spark, log_dir, os.path.join(work, "run-main"))
    result["metric"] = "cdc_replay_e2e_sec"
    result["value"] = head["wall_sec"]
    result["unit"] = "sec"
    result["final_rows"] = head["final_rows"]
    result["events_per_sec"] = round(N_EVENTS / head["wall_sec"], 1)
    result["queries"] = timed_queries(spark)
    spark.stop()

    # --- scaling evidence: same input, LOW vs HIGH cores
    if SCALING:
        tps = {}
        for cpus in (SCALE_LOW, CPUS):
            s = session(cpus)
            m = run_replay(s, log_dir, os.path.join(work, f"run-{cpus}"))
            tps[cpus] = N_EVENTS / m["wall_sec"]
            s.stop()
        eff = (tps[CPUS] / tps[SCALE_LOW]) / (CPUS / SCALE_LOW)
        result["scaling"] = {
            "cpus_low": SCALE_LOW,
            "cpus_high": CPUS,
            "events_per_sec_low": round(tps[SCALE_LOW], 1),
            "events_per_sec_high": round(tps[CPUS], 1),
            "efficiency": round(eff, 3),
        }

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
