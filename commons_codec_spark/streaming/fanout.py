"""Multi-table fan-out: one heterogeneous CDC stream, N target tables.

The reference translates a single event stream for many tables at once —
per-event ``(schema, table)`` routing with per-table schema state
(``/root/reference/src/commons_codec/transform/aws_dms.py:39-44`` routing,
``:86-115`` per-table strategy factory, ``:133-144`` per-table store
seeding).  :class:`MultiTablePipeline` is the Spark-shaped equivalent:

* ONE scan of the raw micro-batch computes each event's routed address
  (``awsdms_*`` special tables divert to the ``dms`` schema, matching
  ``aws_dms.py:39-44``) and the batch is persisted once;
* each registered target then decodes/folds/merges ONLY its filtered
  slice through its own :class:`~.pipeline.CDCPipeline` — per-table
  payload schemas stay independent (heterogeneous streams genuinely need
  per-table ``from_json`` schemas, so the *decode* is per table while the
  *source scan* is shared via the persist);
* all per-table pipelines share ONE :class:`~..registry.SchemaRegistry`
  (the reference's ``schema:table``-keyed stores), checkpoint-persisted
  with the batch id;
* events addressed to tables nobody registered are counted and
  (optionally) written to a dead-letter dir — a stream carrying a table
  you don't ingest must not kill the job (reference: unknown tables are
  skipped unless a ``create-table`` arrives).

Exactly-once composes per sink: each target lake keeps its own
applied-batch-id set, so a crash after table A merged but before table B
resumes with A skipping (idempotent) and B applying.

100-TB notes: the persist materializes the batch once (memory-and-disk),
and every per-table branch is a filter over that cached columnar batch —
no re-scan of the source per table.  The per-table merge jobs are
independent DAGs over disjoint sinks, so they are submitted CONCURRENTLY
(``max_parallel_tables`` threads, one scheduler pool per table; measured
in ``bench.py``'s fan-out phase and pinned by
``tests/test_fanout.py::test_concurrent_matches_sequential``).  Results
are assembled in sorted table order, so metrics stay deterministic
regardless of completion order.  Routing adds no shuffle: the
route columns are already in the envelope, and each table's fold/merge
partitioning is unchanged from the single-table path.
"""

from __future__ import annotations

import dataclasses
import os
import time
import weakref
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from commons_codec_spark.functions.dms import route_schema
from commons_codec_spark.lake.interface import LakeSink
from commons_codec_spark.registry import SchemaRegistry
from commons_codec_spark.streaming.pipeline import CDCPipeline, PipelineConfig


def _shutdown_pool(cell: list) -> None:
    """weakref.finalize target — must not reference the pipeline."""
    pool = cell[0]
    if pool is not None:
        pool.shutdown(wait=False)
        cell[0] = None


@dataclass
class TableTarget:
    """One fan-out destination: a keyed lake table + its pipeline config.

    ``config.schema_name`` / ``config.table_name`` are overwritten with
    the routing address the target is registered under, so the shared
    registry state and the routing key can never disagree.
    """

    table: LakeSink
    config: PipelineConfig


class MultiTablePipeline:
    """Route one envelope stream into N per-table decode→fold→merge paths."""

    def __init__(
        self,
        spark: SparkSession,
        targets: dict[tuple[str, str], TableTarget],
        registry: SchemaRegistry | None = None,
        checkpoint_dir: str | None = None,
        unknown_table_dlq: str | None = None,
        max_parallel_tables: int = 4,
    ):
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.unknown_table_dlq = unknown_table_dlq
        #: per-batch merge concurrency: the per-table merge jobs touch
        #: disjoint sinks, so they are submitted from a thread pool (each
        #: thread tagging its jobs with a per-table scheduler pool).  1 =
        #: the old sequential submission.  The pool tags take full effect
        #: when the session runs with ``spark.scheduler.mode=FAIR`` (set it
        #: via ``get_spark(extra_conf=...)`` — it is fixed at context
        #: start); under default FIFO the concurrent jobs still overlap
        #: whenever the head job leaves cores idle, which is where the
        #: measured win comes from on local[N].
        self.max_parallel_tables = max(int(max_parallel_tables), 1)
        self.registry = (
            registry
            or (checkpoint_dir and SchemaRegistry.load(checkpoint_dir))
            or SchemaRegistry()
        )
        self._pool: ThreadPoolExecutor | None = None
        # last-resort pool reaper for callers that drop the pipeline
        # without close(): each pool thread pins a JVM companion thread
        # under pinned-thread mode, so a long-lived driver constructing
        # many pipelines would otherwise leak both sides.  finalize holds
        # no reference to self (it closes over a mutable cell), so it
        # cannot keep the pipeline alive.
        self._pool_cell: list[ThreadPoolExecutor | None] = [None]
        self._finalizer = weakref.finalize(self, _shutdown_pool, self._pool_cell)
        self.pipelines: dict[tuple[str, str], CDCPipeline] = {}
        for (schema, table), target in targets.items():
            # copy, don't mutate: a caller sharing one PipelineConfig across
            # targets would otherwise have every pipeline aliased to the
            # last-registered table's schema:table identity
            cfg = dataclasses.replace(
                target.config, schema_name=schema, table_name=table
            )
            # per-table pipelines share the ONE registry; checkpoint saving
            # is centralized here (one save per batch, not one per table)
            self.pipelines[(schema, table)] = CDCPipeline(
                spark, target.table, cfg, registry=self.registry
            )
        self.metrics: list[dict] = []

    # ------------------------------------------------------------ one batch

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        schema_col: str = "schema_name",
        table_col: str = "table_name",
    ) -> dict:
        """Apply one heterogeneous micro-batch to every registered target.

        The batch must carry the routing columns (``schema_name`` /
        ``table_name`` in the default envelope; the reference reads them
        from ``metadata`` — ``aws_dms.py:39-44``).  ``awsdms_*`` tables
        are diverted to the ``dms`` schema before lookup.
        """
        t0 = time.time()
        routed = batch.withColumn(
            "__route_schema", route_schema(F.col(schema_col), F.col(table_col))
        )
        # one materialization; every per-table branch filters this cache
        routed = routed.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # distinct routes: bounded by the table count, not the data
            routes = [
                (r[0], r[1])
                for r in routed.select("__route_schema", table_col)
                .distinct()
                .collect()
            ]
            known = [r for r in routes if tuple(r) in self.pipelines]
            unknown = [r for r in routes if tuple(r) not in self.pipelines]

            unknown_rows = 0
            if unknown:
                # eqNullSafe: an envelope with a NULL schema/table routes
                # to an unknown (None, ...) address — plain == would yield
                # NULL and silently drop such rows from both the count and
                # the dead-letter output
                cond = None
                for s, t in unknown:
                    c = F.col("__route_schema").eqNullSafe(F.lit(s)) & F.col(
                        table_col
                    ).eqNullSafe(F.lit(t))
                    cond = c if cond is None else (cond | c)
                miss = routed.filter(cond)
                if self.unknown_table_dlq:
                    # batch_id-scoped dir + overwrite: a replayed micro-batch
                    # (crash after the DLQ write, before every per-table
                    # merge applied) re-writes the same slice instead of
                    # appending duplicates — the DLQ inherits the same
                    # exactly-once story as the sinks
                    out = miss
                    if "batch_id" in out.columns:
                        # the dir name IS the partition column batch_id; a
                        # data column of the same name (direct apply_batch
                        # callers often keep it) would make every later
                        # read of the DLQ throw a duplicate-column error
                        out = out.withColumnRenamed("batch_id", "src_batch_id")
                    out.write.mode("overwrite").parquet(
                        os.path.join(self.unknown_table_dlq, f"batch_id={batch_id}")
                    )
                unknown_rows = miss.count()

            # Per-table merges touch disjoint sinks and the persisted batch,
            # so they are independent DAGs: submit them concurrently from a
            # thread pool, each thread tagging its jobs with a per-table
            # scheduler pool (effective under FAIR scheduling; under default
            # FIFO the jobs still overlap whenever the head job leaves cores
            # idle).  Registry seeding happened in __init__ under distinct
            # schema:table keys; the only cross-thread mutations are
            # per-key dict/list writes, which are atomic in CPython.
            ordered = sorted(known)
            per_table: dict[str, dict] = {}

            def _one(route):
                s, t = route
                sc = self.spark.sparkContext
                # restore, don't clear: in the sequential fallback this runs
                # on the CALLER's thread, and a caller-set scheduler pool
                # must survive the batch
                prev_pool = sc.getLocalProperty("spark.scheduler.pool")
                sc.setLocalProperty("spark.scheduler.pool", f"fanout-{s}-{t}")
                try:
                    sub = routed.filter(
                        (F.col("__route_schema") == s) & (F.col(table_col) == t)
                    ).drop("__route_schema")
                    return self.pipelines[(s, t)].apply_batch(sub, batch_id)
                finally:
                    sc.setLocalProperty("spark.scheduler.pool", prev_pool)

            if self.max_parallel_tables > 1 and len(ordered) > 1:
                if self._pool is None:
                    # one executor per pipeline, reused across micro-batches:
                    # under pinned-thread mode every NEW Python thread opens
                    # its own JVM companion thread/connection, so spawning a
                    # fresh pool per batch would churn driver threads for the
                    # lifetime of a stream
                    self._pool = ThreadPoolExecutor(
                        max_workers=self.max_parallel_tables,
                        thread_name_prefix="fanout-merge",
                    )
                    self._pool_cell[0] = self._pool
                    if not self._finalizer.alive:  # re-armed after close()
                        self._finalizer = weakref.finalize(
                            self, _shutdown_pool, self._pool_cell
                        )
                # wait for EVERY future before propagating a failure: the
                # batch is unpersisted in the finally below, and surviving
                # merges must not race that (or the caller's post-crash
                # assertions) in background threads
                futures = [self._pool.submit(_one, r) for r in ordered]
                results, first_exc = [], None
                for f in futures:
                    try:
                        results.append(f.result())
                    except Exception as exc:  # noqa: BLE001 — re-raised below
                        first_exc = first_exc or exc
                        results.append(None)
                if first_exc is not None:
                    raise first_exc
            else:
                results = [_one(r) for r in ordered]
            for (s, t), m in zip(ordered, results):
                per_table[f"{s}:{t}"] = m
        finally:
            routed.unpersist()

        if self.checkpoint_dir is not None:
            self.registry.save(self.checkpoint_dir, batch_id)
        out = {
            "batch_id": batch_id,
            "tables": per_table,
            "unknown_routes": sorted(f"{s}:{t}" for s, t in unknown),
            "unknown_rows": unknown_rows,
            "wall_sec": round(time.time() - t0, 3),
        }
        self.metrics.append(out)
        return out

    # ------------------------------------------------------------ lifecycle

    def close(self) -> None:
        """Shut down the merge thread pool.  Call when the pipeline is
        done (or use the pipeline as a context manager); otherwise the
        ``weakref.finalize`` reaper releases the threads at GC time."""
        self._finalizer()  # runs _shutdown_pool once; later calls no-op
        self._pool = None

    def __enter__(self) -> "MultiTablePipeline":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------ replay

    def run_replay(self, events: DataFrame, batch_col: str = "batch_id") -> list[dict]:
        """Micro-batch replay driven by the ``batch_id`` column (batch-mode
        twin of the streaming path, as in :meth:`CDCPipeline.run_replay`)."""
        batch_ids = sorted(
            r[0] for r in events.select(batch_col).distinct().collect()
        )
        return [
            self.apply_batch(
                events.filter(F.col(batch_col) == bid).drop(batch_col), int(bid)
            )
            for bid in batch_ids
        ]

    # ------------------------------------------------------------ streaming

    def run_stream(
        self,
        source_dir: str | None,
        source_format: str = "parquet",
        schema: str | None = None,
        checkpoint_dir: str | None = None,
        max_files_per_trigger: int = 4,
        source_options: dict | None = None,
        available_now: bool = True,
        stream_transform=None,
    ):
        """Structured-Streaming form: one ``readStream`` fans out inside
        ``foreachBatch``; offsets in the checkpoint + per-sink idempotent
        merges = exactly-once across ALL targets.  ``source_dir=None`` +
        ``source_options`` target path-less sources (Kafka, registered
        Python data sources) exactly as in :meth:`CDCPipeline.run_stream`;
        ``stream_transform`` (e.g. ``unwrap_wire_envelope(routed=True)``)
        maps wire rows to routed envelope rows on the streaming DataFrame,
        so one heterogeneous topic fans out to every registered table.
        """
        checkpoint = checkpoint_dir or self.checkpoint_dir
        if checkpoint is None:
            raise ValueError(
                "run_stream requires a checkpoint_dir (pass it here or on "
                "the pipeline) — streaming offsets have nowhere to live"
            )
        reader = self.spark.readStream.format(source_format)
        if source_dir is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        for k, v in (source_options or {}).items():
            reader = reader.option(k, v)
        if schema:
            reader = reader.schema(schema)
        stream = reader.load(source_dir) if source_dir is not None else reader.load()
        if stream_transform is not None:
            stream = stream_transform(stream)
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self.apply_batch(
                df.drop("batch_id") if "batch_id" in df.columns else df, bid
            )
        ).option("checkpointLocation", os.path.join(checkpoint, "offsets"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
