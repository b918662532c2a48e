"""Per-query isolation harness for optimization rounds (bench.py is frozen).

Times every declared query with the noop sink (guide §1.4) in declaration
order — the same methodology as bench.py's sweep — records each sample,
and optionally dumps ``explain("formatted")`` plans.

Usage:
    python bench_extra.py --out /tmp/q.json [--runs 2] [--plans plans/r06 \
        --suffix before] [--only name1,name2]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from commons_codec_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-extra-{CPUS}", cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    only = set(args.only.split(",")) if args.only else None
    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "queries": {}}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
        if walls:
            out["queries"][name] = {"samples": walls, "min": min(walls)}
        print(f"{name}: {walls}", flush=True)
    spark.sparkContext.setJobDescription(None)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
