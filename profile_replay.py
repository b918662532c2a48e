"""Phase profile of the headline CDC replay (bench.py methodology, one run).

Prints per-batch pipeline metrics (hint_sec = prescan agg, merge_sec =
decode→fold→join→write job) plus generation and read-back walls, so the
optimization target inside the replay is visible.

Usage: python profile_replay.py [n_events] [n_buckets] [runs]
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

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 64
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def main() -> None:
    from commons_codec_spark.session import get_spark

    import bench

    spark = get_spark(app_name=f"profile-replay-{CPUS}", cpus=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ccs-prof-", dir=base)
    log_dir = os.path.join(work, "eventlog")
    t0 = time.time()
    bench.N_EVENTS = N
    bench.make_log(spark, log_dir)
    print(f"make_log: {time.time()-t0:.2f}s", flush=True)

    from commons_codec_spark.lake.table import KeyedLakeTable
    from commons_codec_spark.sources.eventlog import SOURCE_CODE_COLUMNS
    from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig

    for r in range(RUNS):
        events = spark.read.parquet(log_dir)
        run_dir = os.path.join(work, f"r{r}")
        table = KeyedLakeTable.create(
            spark, os.path.join(run_dir, "tbl"),
            key_schema={"repo": "string", "path": "string"}, n_buckets=NB,
        )
        pipe = CDCPipeline(
            spark, table,
            PipelineConfig(keys=["repo", "path"],
                           image_columns=SOURCE_CODE_COLUMNS,
                           discover_columns=False),
            checkpoint_dir=os.path.join(run_dir, "ckpt"),
        )
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"replay r{r}")
        pipe.run_replay(events)
        wall = time.time() - t0
        print(f"run {r}: wall={wall:.2f}s "
              + json.dumps(pipe.metrics), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
