"""The CDC ingest pipeline: decode → fold → merge, batch and streaming.

Engine lifecycle (SURVEY.md §3, target shape)::

    readStream(event log) → foreachBatch[
        decode (JVM-compiled descriptor decode; Arrow UDF fallback)
        → validate / DLQ split
        → per-key two-branch fold (skew-salted two-phase reduce)
        → KeyedLakeTable.merge (bucket-pruned, ordering-guarded, idempotent)
        → metrics + lineage
    ] with checkpointed offsets

Exactly-once: Structured Streaming replays a failed micro-batch with the
same batch_id; ``KeyedLakeTable.merge`` refuses to re-apply an applied
batch_id, so replay is a no-op (the ON-CONFLICT-DO-NOTHING analog at batch
granularity — reference motivation ``/root/reference/CHANGES.md:20-24``).

Schema evolution: before decoding, each batch's image keys are scanned
JVM-side (``json_object_keys``) and new columns are registered + added to
the decode schema; the lake widens on merge (north rule's ``lang`` case).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from commons_codec_spark.functions.dynamodb import compile_direct_decoder
from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.operators.cdc_fold import fold_net_changes
from commons_codec_spark.registry import SchemaRegistry


@dataclass
class PipelineConfig:
    keys: list[str]
    image_columns: dict[str, str]  # column -> descriptor marker (seed schema)
    seq_col: str = "commit_seq"
    schema_name: str = "public"
    table_name: str = "source_code"
    salt_chunks: int | None = None  # skew salting for the fold
    discover_columns: bool = True  # additive schema evolution from images
    dlq_dir: str | None = None


class CDCPipeline:
    """Drives decode→fold→merge for one keyed target table."""

    def __init__(
        self,
        spark: SparkSession,
        table: KeyedLakeTable,
        config: PipelineConfig,
        registry: SchemaRegistry | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.table = table
        self.cfg = config
        self.checkpoint_dir = checkpoint_dir
        self.registry = (
            registry
            or (checkpoint_dir and SchemaRegistry.load(checkpoint_dir))
            or SchemaRegistry()
        )
        # seed the registry with the declared schema
        self.registry.note_columns(
            config.schema_name, config.table_name, list(config.image_columns)
        )
        self._image_columns = dict(config.image_columns)
        self.metrics: list[dict] = []

    # ------------------------------------------------------------ evolution

    def _discover_columns(self, batch: DataFrame) -> None:
        """Detect new image columns (JVM-side) and widen the decode schema.

        One distinct over ``json_object_keys(image)`` — no Python, and the
        distinct set is tiny (column names).  New columns' descriptor
        markers are sniffed from one sample value.
        """
        if not self.cfg.discover_columns:
            return
        observed = [
            r[0]
            for r in batch.filter(F.col("image").isNotNull())
            .select(F.explode(F.json_object_keys("image")).alias("k"))
            .distinct()
            .collect()
        ]
        fresh = [c for c in observed if c not in self._image_columns]
        if not fresh:
            return
        for col in fresh:
            sample = (
                batch.filter(F.col("image").isNotNull())
                .select(F.get_json_object("image", f"$.{col}").alias("v"))
                .filter(F.col("v").isNotNull())
                .first()
            )
            marker = "S"
            if sample and sample[0]:
                try:
                    marker = next(iter(json.loads(sample[0]).keys()))
                except Exception:  # noqa: BLE001 — default to string
                    marker = "S"
            self._image_columns[col] = marker
        self.registry.note_columns(self.cfg.schema_name, self.cfg.table_name, fresh)

    # ------------------------------------------------------------ one batch

    def apply_batch(self, batch: DataFrame, batch_id: int) -> dict:
        t0 = time.time()
        if batch_id in self.table.applied_batch_ids():
            return {"batch_id": batch_id, "skipped": True}

        self._discover_columns(batch)

        # decode (JVM): image JSON -> typed columns; deletes decode keys_json
        src = batch.withColumn(
            "image", F.coalesce(F.col("image"), F.col("keys_json"))
        )
        decoded = compile_direct_decoder(src, "image", self._image_columns)

        # DLQ: events whose key fields failed to decode.  Counted via an
        # Observation (piggybacks on the merge's own pass — no extra job);
        # rows are only materialized separately when a DLQ sink is set.
        key_ok = None
        for k in self.cfg.keys:
            cond = F.col(k).isNotNull()
            key_ok = cond if key_ok is None else (key_ok & cond)
        obs = Observation(f"dlq-{batch_id}")
        decoded = decoded.observe(
            obs, F.sum(F.when(~key_ok, 1).otherwise(0)).alias("dlq_rows")
        )
        if self.cfg.dlq_dir:
            decoded.filter(~key_ok).write.mode("append").parquet(self.cfg.dlq_dir)
        good = decoded.filter(key_ok)

        payload_cols = [c for c in self._image_columns if c not in self.cfg.keys]
        net = fold_net_changes(
            good,
            keys=self.cfg.keys,
            payload_cols=payload_cols,
            seq_col=self.cfg.seq_col,
            salt_chunks=self.cfg.salt_chunks,
        )
        merge_metrics = self.table.merge(net, batch_id=batch_id)
        dlq_count = int(obs.get.get("dlq_rows") or 0)

        if self.checkpoint_dir:
            self.registry.save(self.checkpoint_dir, batch_id)

        m = {
            "batch_id": batch_id,
            "wall_sec": round(time.time() - t0, 3),
            "dlq_rows": dlq_count,
            **merge_metrics,
        }
        self.metrics.append(m)
        self._emit_metrics(m)
        return m

    def _emit_metrics(self, m: dict) -> None:
        if self.checkpoint_dir:
            path = os.path.join(self.checkpoint_dir, "metrics.jsonl")
            with open(path, "a") as fh:
                fh.write(json.dumps(m) + "\n")

    # ------------------------------------------------------------ batch replay

    def run_replay(
        self,
        events: DataFrame,
        batch_col: str = "batch_id",
        stop_after_batches: int | None = None,
    ) -> list[dict]:
        """Replay an event log micro-batch by micro-batch (batch mode).

        Equivalent to the streaming path but driven by the ``batch_id``
        column; used for deterministic tests and the bench.  Honors the
        lake's applied-batch-id bookkeeping, so re-running after a kill
        resumes where it left off (idempotent).
        """
        batch_ids = sorted(
            r[0] for r in events.select(batch_col).distinct().collect()
        )
        done = 0
        out = []
        for bid in batch_ids:
            if stop_after_batches is not None and done >= stop_after_batches:
                break
            m = self.apply_batch(
                events.filter(F.col(batch_col) == bid).drop(batch_col), int(bid)
            )
            out.append(m)
            if not m.get("skipped"):
                done += 1
        return out

    # ------------------------------------------------------------ streaming

    def run_stream(
        self,
        source_dir: str,
        source_format: str = "parquet",
        schema: str | None = None,
        checkpoint_dir: str | None = None,
        max_files_per_trigger: int = 4,
    ):
        """Tail a directory of envelope files with Structured Streaming.

        Each micro-batch flows through :meth:`apply_batch` inside
        ``foreachBatch``; offsets live in the checkpoint, merge idempotence
        in the lake commit log — together: exactly-once.
        """
        checkpoint = checkpoint_dir or self.checkpoint_dir
        reader = (
            self.spark.readStream.format(source_format)
            .option("maxFilesPerTrigger", max_files_per_trigger)
        )
        if schema:
            reader = reader.schema(schema)
        stream = reader.load(source_dir)
        query = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df.drop("batch_id"), bid)
            )
            .option("checkpointLocation", os.path.join(checkpoint, "offsets"))
            .trigger(availableNow=True)
            .start()
        )
        return query
