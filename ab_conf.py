"""Interleaved A/B over a RUNTIME SQL conf (ab_test.py's sibling).

Usage:
    python ab_conf.py --queries q1,q2 \
        --conf spark.sql.join.preferSortMergeJoin=true::false --rounds 3

Same methodology as ab_test.py (one session, variants alternating per
round, min + median reported) but toggles a ``spark.conf.set``-able SQL
conf between query builds instead of an env var — for decisions like the
join strategy, which env levers cannot reach.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--conf", required=True, help="key=v1::v2[::v3]")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    key, _, vals = args.conf.partition("=")
    variants = vals.split("::")
    if len(set(variants)) != len(variants):
        raise SystemExit("duplicate variant values would pool their samples")

    import __spark_entry__ as entrymod
    from commons_codec_spark.session import get_spark

    spark = get_spark(
        app_name=f"abconf-{CPUS}", cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    prior = spark.conf.get(key, None)
    qs = entrymod.queries()
    names = args.queries.split(",")
    walls: dict = {q: {v: [] for v in variants} for q in names}
    for r in range(args.rounds):
        for q in names:
            for v in variants:
                spark.conf.set(key, v)
                spark.sparkContext.setJobDescription(f"abconf:{q}:{key}={v}:r{r}")
                t0 = time.time()
                qs[q](spark, SF_DIR).write.mode("overwrite").format("noop").save()
                walls[q][v].append(round(time.time() - t0, 3))
    if prior is not None:
        spark.conf.set(key, prior)
    report = {}
    for q in names:
        report[q] = {
            v: {"samples": s, "min": min(s), "median": statistics.median(s)}
            for v, s in walls[q].items()
        }
        print(q, json.dumps(report[q]), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
