"""Watermarked event-time windows: finalized emission + late-data drop."""

import datetime as dt
import os

import pyspark.sql.functions as F

from commons_codec_spark.streaming.windows import windowed_op_counts

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows():
    def at(minute, second=0):
        return T0 + dt.timedelta(minutes=minute, seconds=second)

    early = [  # first file: two busy minutes
        ("insert", at(0, 10)), ("insert", at(0, 40)), ("update", at(0, 50)),
        ("insert", at(1, 5)), ("delete", at(1, 30)),
    ]
    advance = [  # second file: far later events advance the watermark
        ("insert", at(10, 0)), ("update", at(10, 30)),
    ]
    late = [  # third file: a TOO-late straggler (watermark is now ~8:30)
        ("insert", at(0, 59)),  # 10 min late > 2 min delay: dropped
        ("insert", at(11, 0)),
    ]
    return early, advance, late


def test_batch_windowed_counts(spark):
    early, advance, late = _rows()
    df = spark.createDataFrame(early + advance + late, "op string, event_ts timestamp")
    out = {
        (r.window_start.minute, r.op): r.n
        for r in windowed_op_counts(df).collect()
    }
    # batch mode has no watermark: the straggler counts in minute 0
    assert out[(0, "insert")] == 3 and out[(0, "update")] == 1
    assert out[(1, "insert")] == 1 and out[(1, "delete")] == 1
    assert out[(10, "insert")] == 1


def test_streaming_watermark_finalizes_and_drops_late(spark, tmp_path):
    import glob
    import shutil

    early, advance, late = _rows()
    src = str(tmp_path / "win-in")
    os.makedirs(src)
    for name, rows in (("a", early), ("b", advance), ("c", late)):
        staging = f"{src}/_stage_{name}"
        spark.createDataFrame(rows, "op string, event_ts timestamp").repartition(
            1
        ).write.parquet(staging)
        shutil.move(glob.glob(staging + "/part-*.parquet")[0], f"{src}/{name}.parquet")
        shutil.rmtree(staging)

    stream = (
        spark.readStream.schema("op string, event_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_op_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM win_counts").collect()
    out = {(r.window_start.minute, r.op): r.n for r in rows}
    # minutes 0 and 1 were finalized (emitted exactly once) when the
    # watermark advanced past their window ends.  The straggler may or may
    # not land depending on which micro-batch the file source assigned it
    # (watermark filtering uses the PREVIOUS batch's watermark), so assert
    # the emission semantics, not the exact straggler fate.
    assert out.get((0, "insert")) in (2, 3) and out.get((0, "update")) == 1
    assert out.get((1, "insert")) == 1 and out.get((1, "delete")) == 1
    # minute 10/11 windows never finalize (no later data advances the
    # watermark past their ends) — append mode correctly withholds them
    assert (10, "insert") not in out and (11, "insert") not in out
