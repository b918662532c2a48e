"""Change-data-feed: the lake's own incremental output.

A table created with ``changelog=True`` persists each merge's net-change
rows (the fold's compact encoding — the engine's own merge input) under
``changes/v{N}``.  These tests pin the contract that matters: a replica
lake tailing the feed version-by-version converges to the source table's
exact state, including deletes/tombstones and mid-stream additive schema
evolution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.sources.eventlog import (
    SOURCE_CODE_COLUMNS,
    generate_event_log,
)
from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig

KEYS = ["repo", "path"]
KEY_SCHEMA = {"repo": "string", "path": "string"}


def _replay_source(spark, tmp_path, n_events=3000):
    src = KeyedLakeTable.create(
        spark, str(tmp_path / "src"), key_schema=KEY_SCHEMA, n_buckets=4,
        changelog=True,
    )
    log = generate_event_log(
        spark, n_events=n_events, n_keys=250, n_repos=6, seed=13, batch_size=1000
    )
    cfg = PipelineConfig(keys=KEYS, image_columns=SOURCE_CODE_COLUMNS)
    CDCPipeline(spark, src, cfg).run_replay(log)
    return src


def _rows(table, **kw):
    df = table.read(**kw)
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_replica_tailing_feed_converges(spark, tmp_path):
    src = _replay_source(spark, tmp_path)
    head = src._current_commit()["version"]
    assert head >= 3  # several merge versions

    replica = KeyedLakeTable.create(
        spark, str(tmp_path / "replica"), key_schema=KEY_SCHEMA, n_buckets=4
    )
    for v in range(1, head + 1):
        try:
            changes = src.read_changes(v, v).drop("_version")
        except ValueError:
            continue  # version without data changes
        replica.merge(changes)

    # visible rows AND tombstones must agree — the feed carries deletes
    assert _rows(replica) == _rows(src)
    assert _rows(replica, include_tombstones=True) == _rows(
        src, include_tombstones=True
    )
    # additive evolution propagated: lang appears mid-stream in the log
    assert "lang" in replica.read().columns


def test_read_changes_versions_and_range(spark, tmp_path):
    src = _replay_source(spark, tmp_path, n_events=2000)
    head = src._current_commit()["version"]
    all_changes = src.read_changes()
    versions = sorted(
        r[0] for r in all_changes.select("_version").distinct().collect()
    )
    assert versions and versions[0] >= 1 and versions[-1] <= head
    one = src.read_changes(versions[0], versions[0])
    assert one.select("_version").distinct().count() == 1
    # net encoding is what merge() consumes
    for col in ("repo", "path", "aa", "aseq", "row"):
        assert col in one.columns


def test_changelog_off_raises(spark, tmp_path):
    t = KeyedLakeTable.create(
        spark, str(tmp_path / "plain"), key_schema=KEY_SCHEMA, n_buckets=2
    )
    with pytest.raises(ValueError, match="changelog=True"):
        t.read_changes()


def test_feed_total_rows_bounded_by_events(spark, tmp_path):
    """CDF write amplification sanity: the feed carries folded NET rows
    (≤ distinct keys touched per batch), not raw events."""
    src = _replay_source(spark, tmp_path, n_events=2000)
    feed_rows = src.read_changes().count()
    distinct_keys = src.read(include_tombstones=True).count()
    # net rows per version ≤ keys touched; across versions ≤ versions * keys
    head = src._current_commit()["version"]
    assert feed_rows <= head * max(distinct_keys, 1)
    assert feed_rows > 0


def test_crash_between_feed_write_and_commit_self_heals(spark, tmp_path):
    """The CDF files are STAGED before the snapshot commit (dot-dir,
    invisible to consumers) and published by rename after it.  A crash in
    that window leaves only a staged dir no consumer can see; the retried
    merge rewrites it (mode=overwrite) and the feed stays consistent with
    the committed history."""
    src = KeyedLakeTable.create(
        spark, str(tmp_path / "crash"), key_schema=KEY_SCHEMA, n_buckets=2,
        changelog=True,
    )
    log = generate_event_log(
        spark, n_events=800, n_keys=80, n_repos=4, seed=29, batch_size=400
    ).cache()
    cfg = PipelineConfig(keys=KEYS, image_columns=SOURCE_CODE_COLUMNS)

    # crash: fail the data write AFTER the changes dir is on disk
    real_write_commit = src._write_commit
    calls = {"n": 0}

    def exploding_commit(*a, **kw):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash after CDF write, before commit")
        return real_write_commit(*a, **kw)

    src._write_commit = exploding_commit
    pipe = CDCPipeline(spark, src, cfg)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        pipe.run_replay(log)
    assert src._current_commit()["version"] == 0  # nothing committed
    import os as _os

    # no published CDF dir — only the invisible staged one
    assert not _os.path.isdir(src._changes_dir(1))
    assert _os.path.isdir(src._staged_changes_dir(1))

    # resume: fresh pipeline, full redelivery — overwrites the orphan
    src._write_commit = real_write_commit
    CDCPipeline(spark, src, cfg).run_replay(log)
    head = src._current_commit()["version"]
    assert head >= 2

    replica = KeyedLakeTable.create(
        spark, str(tmp_path / "crash-replica"), key_schema=KEY_SCHEMA, n_buckets=2
    )
    for v in range(1, head + 1):
        try:
            changes = src.read_changes(v, v).drop("_version")
        except ValueError:
            continue  # version without data changes
        # merge OUTSIDE the try: its ValueErrors are real failures
        replica.merge(changes)
    assert _rows(replica, include_tombstones=True) == _rows(
        src, include_tombstones=True
    )


def test_reader_heals_committed_but_unpublished_version(spark, tmp_path):
    """Crash window between _write_commit and the publish rename: the
    version is committed but its CDF sits in .staged-v*.  A replica
    tailing read_changes(last+1, head) BEFORE any further merge must still
    see that version's changes — the readers heal, not just the next
    merge (otherwise the tail is silently and permanently incomplete)."""
    import os as _os

    src = _replay_source(spark, tmp_path, n_events=1200)
    head = src._current_commit()["version"]
    assert head >= 2

    # simulate the crash: un-publish the head version's CDF dir
    published = src._changes_dir(head)
    staged = src._staged_changes_dir(head)
    _os.replace(published, staged)

    got = src.read_changes(head, head)
    assert got.count() > 0  # healed on read, no merge in between
    assert _os.path.isdir(published) and not _os.path.isdir(staged)

    # stream_changes heals the same window
    _os.replace(published, staged)
    assert src.stream_changes() is not None
    assert _os.path.isdir(published)


def test_stream_changes_and_retention(spark, tmp_path):
    """The feed is streaming-consumable (readStream picks up every
    version's net rows) and retention is an explicit, bounded operation."""
    src = _replay_source(spark, tmp_path, n_events=2000)
    head = src._current_commit()["version"]

    batch_rows = src.read_changes().count()
    stream = src.stream_changes()
    q = (
        stream.writeStream.format("memory")
        .queryName("cdf_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT count(*) c FROM cdf_stream").collect()[0]["c"]
    assert streamed == batch_rows

    # retention: expire everything before the head version
    dropped = src.vacuum_changes(keep_since_version=head)
    assert dropped >= 1
    remaining = src.read_changes()
    versions_left = [
        r[0] for r in remaining.select("_version").distinct().collect()
    ]
    assert versions_left == [head]


def test_cdf_version_invisible_until_commit(spark, tmp_path):
    """ADVICE r2: the CDF dir for a version must not be observable by feed
    consumers (read_changes / stream_changes / v* globs) before that
    version's commit lands.  The write is staged under a dot-dir and
    published by rename after _write_commit; a crash between commit and
    rename self-heals on the next merge."""
    import os

    src = KeyedLakeTable.create(
        spark, str(tmp_path / "src"), key_schema=KEY_SCHEMA, n_buckets=2,
        changelog=True,
    )
    log = generate_event_log(
        spark, n_events=400, n_keys=40, n_repos=3, seed=5, batch_size=400
    )
    cfg = PipelineConfig(keys=KEYS, image_columns=SOURCE_CODE_COLUMNS)
    pipe = CDCPipeline(spark, src, cfg)

    # 1. commit failure: staged CDF dir exists, published dir does NOT
    real_write_commit = src._write_commit

    def boom(*a, **kw):
        raise RuntimeError("simulated commit crash")

    src._write_commit = boom
    with pytest.raises(RuntimeError):
        pipe.run_replay(log)
    changes_root = os.path.join(src.root, "changes")
    published = [d for d in os.listdir(changes_root) if d.startswith("v")]
    staged = [d for d in os.listdir(changes_root) if d.startswith(".staged-v")]
    assert published == [] and len(staged) == 1

    # 2. retry with the commit restored: staged dir is overwritten and
    # published exactly once; replica converges from the feed
    src._write_commit = real_write_commit
    pipe2 = CDCPipeline(spark, src, cfg)
    pipe2.run_replay(log)
    published = sorted(d for d in os.listdir(changes_root) if d.startswith("v"))
    assert published == ["v%012d" % 1]
    assert not [d for d in os.listdir(changes_root) if d.startswith(".staged")]

    # 3. crash in the commit->rename window: heal on next merge.  The
    # crashed merge COMMITTED its version (we write its commit directly,
    # as merge would have) but died before the publish rename — heal must
    # publish.  (A staged dir whose version is claimed by a NON-merge
    # writer is the opposite case: discarded, pinned by
    # test_rebucket_discards_crashed_staged_changes.)
    v2 = src._current_commit()["version"] + 1
    staged_dir = src._staged_changes_dir(v2)
    os.makedirs(staged_dir, exist_ok=True)
    c = src._current_commit()
    src._write_commit(
        v2, None, c["buckets"], c["applied_batch_ids"], c["payload_schema"]
    )
    assert not os.path.isdir(src._changes_dir(v2))
    src._heal_staged_changes()
    assert os.path.isdir(src._changes_dir(v2))

    replica = KeyedLakeTable.create(
        spark, str(tmp_path / "replica"), key_schema=KEY_SCHEMA, n_buckets=2
    )
    replica.merge(src.read_changes(1, 1).drop("_version"))
    # version 1 carried the whole batch; state at v1 == replica state
    assert _rows(replica, include_tombstones=True)


def test_compose_net_changes_range_equals_per_version_replay(spark, tmp_path):
    """Fold associativity over the feed: composing [1, head] into ONE
    merge must equal the per-version replay exactly — deletes, tombstones
    and mid-stream additive evolution (lang) included."""
    from commons_codec_spark.operators.cdc_fold import compose_net_changes

    src = _replay_source(spark, tmp_path)
    head = src._current_commit()["version"]
    assert head >= 3

    loop = KeyedLakeTable.create(
        spark, str(tmp_path / "loop"), key_schema=KEY_SCHEMA, n_buckets=4
    )
    for v in range(1, head + 1):
        try:
            changes = src.read_changes(v, v).drop("_version")
        except ValueError:
            continue
        loop.merge(changes)

    one = KeyedLakeTable.create(
        spark, str(tmp_path / "one"), key_schema=KEY_SCHEMA, n_buckets=4
    )
    one.merge(compose_net_changes(src.read_changes(1, head), keys=KEYS))

    assert _rows(one) == _rows(loop) == _rows(src)
    assert _rows(one, include_tombstones=True) == _rows(
        loop, include_tombstones=True
    )
    # single merge => single replica version
    assert one._current_commit()["version"] == 1
    # a later tail composes and applies incrementally too
    assert "lang" in one.read().columns
