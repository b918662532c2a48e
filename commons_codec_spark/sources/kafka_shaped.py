"""Kafka-shaped CDC source: the broker-wire dialect, runnable without a broker.

The reference consumes change events from AWS-managed transports; a
production deployment of THIS engine would most commonly tail a Kafka
topic (`spark.readStream.format("kafka")` + the kafka connector jar).
That jar is absent in this sandbox, so the transport seam is proven with
a **Spark 4 Python Data Source** (`pyspark.sql.datasource`) that emits
rows in the exact Kafka wire shape — ``key``/``value`` binary, ``topic``,
``partition``, ``offset``, ``timestamp`` — from a deterministic synthetic
CDC stream, with REAL streaming offset semantics: the engine checkpoints
this reader's offsets exactly as it would Kafka's, so resume/exactly-once
flow through the same machinery (`CDCPipeline.run_stream` →
`foreachBatch` → idempotent merge).

Swapping to a real broker is a config change, not a code change::

    pipe.run_stream(None, source_format="kafka",
                    source_options={"kafka.bootstrap.servers": ...,
                                    "subscribe": "cdc.events"},
                    decoder=...same make_kafka_cdc_decoder(...))

Two topic models, selected by the ``topic_partitions`` option:

* ``"1"`` (default) — single-partition topic: ``offset`` is a global
  order, the scalar offset dict matches the classic file-source shape.
* ``N > 1`` — the REAL Kafka offset model: a COMPOSITE offset dict with
  one independent offset per topic partition (``{"0": o0, "1": o1, …}``),
  keys pinned to partitions (Kafka's same-key-same-partition guarantee),
  ordering only WITHIN a partition.  ``commit_seq`` is assigned so a
  key's events ascend in its partition's offset order — cross-partition
  interleaving is arbitrary, which is exactly what the engine's
  seq-based two-branch fold + ordering-guarded merge absorb.

100-TB note: the generator itself is a test/bench tool; the decoder
(`make_kafka_cdc_decoder`) is the production piece — one ``from_json``
over ``value`` then the compiled JVM image decode, no Python workers.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from hashlib import md5
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: The Kafka source's fixed output schema (connector-compatible subset).
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp"
)

_ENVELOPE_DDL = "op string, commit_seq long, keys_json string, image string"

_EPOCH_BASE = 1_700_000_000  # fixed so the stream is bit-deterministic


def _wire_event(
    i: int, n_keys: int, seed: int, n_tables: int = 0, evolve_from: int = -1
) -> tuple:
    """Deterministic event ``i`` of the simulated single-partition topic.

    Op mix mirrors the engine's synthetic event log: mostly inserts with
    interleaved updates and deletes of earlier keys, so the final state
    exercises every fold branch.
    """
    h = int(md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
    k = h % n_keys
    return _wire_tuple(
        i=i, seq=i, k=k, h=h, partition=k % 4,
        n_tables=n_tables, evolve_from=evolve_from,
    )


def _wire_event_mp(
    p: int, j: int, tp: int, n_keys: int, seed: int,
    n_tables: int = 0, evolve_from: int = -1,
) -> tuple:
    """Deterministic event at offset ``j`` of topic partition ``p`` (of
    ``tp``).  Keys are pinned to partitions (``k % tp == p``) and
    ``commit_seq = j * tp + p`` — globally unique and ascending in each
    partition's offset order, so a key's events (which all live in one
    partition) arrive seq-ordered regardless of how the engine interleaves
    partitions across micro-batches."""
    h = int(md5(f"{seed}:{p}:{j}".encode()).hexdigest()[:8], 16)
    keys_per_part = max(n_keys // tp, 1)
    k = p + tp * (h % keys_per_part)
    return _wire_tuple(
        i=j, seq=j * tp + p, k=k, h=h, partition=p,
        n_tables=n_tables, evolve_from=evolve_from,
    )


def _wire_tuple(
    i: int, seq: int, k: int, h: int, partition: int,
    n_tables: int = 0, evolve_from: int = -1,
) -> tuple:
    if i % 7 == 3:
        op, image = "delete", None
    else:
        op = "update" if i % 3 == 1 else "insert"
        img = {
            "uid": {"N": str(k)},
            "name": {"S": f"u{k}-{seq}"},
            "val": {"N": str(h % 100_000)},
        }
        # schema evolution mid-stream: images from wire offset
        # ``evolve_from`` onward carry an additive column (the north
        # rule's ``lang`` case, delivered over the wire transport)
        if 0 <= evolve_from <= i:
            img["lang"] = {"S": f"l{k % 7}"}
        image = json.dumps(img, separators=(",", ":"))
    keys_json = json.dumps({"uid": {"N": str(k)}}, separators=(",", ":"))
    envelope: dict = {"op": op, "commit_seq": seq}
    if n_tables > 0:
        # heterogeneous topic: each key belongs to ONE table (so per-key
        # ordering survives routing), route fields ride inside `value`
        # exactly as a multi-table Debezium/DMS topic would carry them
        envelope["schema_name"] = "public"
        envelope["table_name"] = f"t{k % n_tables}"
    envelope.update({"keys_json": keys_json, "image": image})
    value = json.dumps(envelope, separators=(",", ":"))
    return (
        keys_json.encode(),
        value.encode(),
        "cdc.events",
        partition,
        i,
        datetime.fromtimestamp(_EPOCH_BASE + seq, tz=timezone.utc),
    )


class _Range(InputPartition):
    def __init__(
        self, start: int, end: int, n_keys: int, seed: int,
        tp: int = 1, p: int = 0, n_tables: int = 0, evolve_from: int = -1,
    ):
        self.start, self.end = start, end
        self.n_keys, self.seed = n_keys, seed
        self.tp, self.p = tp, p
        self.n_tables, self.evolve_from = n_tables, evolve_from


class _SimStreamReader(DataSourceStreamReader):
    """Offset-tracked reader.  Single-partition mode: ``latestOffset``
    advances ``rows_per_batch`` events per trigger until ``n_events``,
    each micro-batch a contiguous offset range split into ``parts`` Spark
    partitions.  Multi-partition mode (``topic_partitions`` > 1): the
    offset is a COMPOSITE dict with one entry per topic partition —
    Kafka's actual checkpoint shape — and each topic partition becomes
    its own Spark input partition per batch."""

    def __init__(self, options):
        self.n_events = int(options.get("n_events", "2000"))
        self.rows_per_batch = int(options.get("rows_per_batch", "500"))
        self.n_keys = int(options.get("n_keys", "200"))
        self.seed = int(options.get("seed", "42"))
        self.parts = int(options.get("parts", "4"))
        self.tp = int(options.get("topic_partitions", "1"))
        self.n_tables = int(options.get("n_tables", "0"))
        self.evolve_from = int(options.get("evolve_from", "-1"))
        self._latest = 0
        # per-partition high-water marks learned from planned batch STARTS:
        # a restarted reader instance starts _latest=0, but the first
        # planned batch's start IS the checkpoint's committed position —
        # see _fast_forward.
        self._floor: dict[str, int] = {}

    def _fast_forward(self, start: dict) -> None:
        """Learn the committed position from a planned batch's start.

        A fresh reader created on restart has ``_latest = 0``, so its
        incremental ``latestOffset`` would otherwise return offsets BELOW
        the checkpoint's committed offset — Spark would commit that
        smaller end (a regressed checkpoint) and the following batch
        would re-plan the already-applied range.  Fast-forwarding
        ``_latest`` to the max committed start stops the regression after
        the first planned batch, and the per-partition ``_floor`` clamps
        every later range's low end so no committed offset is ever
        re-emitted (the one batch planned BEFORE this learns anything is
        empty by the ``end > start`` guards below).  Residual window: a
        second crash inside that first post-restart batch can leave the
        checkpoint one regressed commit behind, in which case the few
        re-emitted rows are absorbed by the merge's seq ordering guard
        (idempotent SETs, tombstone-guarded deletes).
        """
        for k, v in start.items():
            v = int(v)
            if self._floor.get(k, 0) < v:
                self._floor[k] = v
            if self._latest < v:
                self._latest = v

    def initialOffset(self) -> dict:
        if self.tp == 1:
            return {"offset": 0}
        return {str(p): 0 for p in range(self.tp)}

    def latestOffset(self) -> dict:
        if self.tp == 1:
            self._latest = min(self._latest + self.rows_per_batch, self.n_events)
            return {"offset": self._latest}
        per_part_cap = self.n_events // self.tp
        step = max(self.rows_per_batch // self.tp, 1)
        self._latest = min(self._latest + step, per_part_cap)
        return {str(p): self._latest for p in range(self.tp)}

    def partitions(self, start: dict, end: dict):
        self._fast_forward(start)
        extra = {"n_tables": self.n_tables, "evolve_from": self.evolve_from}
        if self.tp > 1:
            out = [
                _Range(max(int(start[k]), self._floor.get(k, 0)), int(end[k]),
                       self.n_keys, self.seed, tp=self.tp, p=p, **extra)
                for p in range(self.tp)
                for k in (str(p),)
                if int(end[k]) > max(int(start[k]), self._floor.get(k, 0))
            ]
            return out or [_Range(0, 0, self.n_keys, self.seed, tp=self.tp)]
        lo = max(int(start["offset"]), self._floor.get("offset", 0))
        hi = int(end["offset"])
        if hi <= lo:
            return [_Range(lo, lo, self.n_keys, self.seed)]
        step = max((hi - lo + self.parts - 1) // self.parts, 1)
        return [
            _Range(s, min(s + step, hi), self.n_keys, self.seed, **extra)
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        nt = getattr(partition, "n_tables", 0)
        ef = getattr(partition, "evolve_from", -1)
        if partition.tp > 1:
            for j in range(partition.start, partition.end):
                yield _wire_event_mp(
                    partition.p, j, partition.tp, partition.n_keys,
                    partition.seed, n_tables=nt, evolve_from=ef,
                )
            return
        for i in range(partition.start, partition.end):
            yield _wire_event(
                i, partition.n_keys, partition.seed,
                n_tables=nt, evolve_from=ef,
            )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint


class CdcKafkaSimDataSource(DataSource):
    """``spark.readStream.format("cdc_kafka_sim")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "cdc_kafka_sim"

    def schema(self) -> str:
        return KAFKA_WIRE_SCHEMA

    def streamReader(self, schema) -> _SimStreamReader:
        return _SimStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the sim source with this session."""
    try:
        spark.dataSource.register(CdcKafkaSimDataSource)
    except Exception:  # noqa: BLE001 — already registered
        pass


def simulated_wire_df(spark: SparkSession, options: dict) -> DataFrame:
    """The SAME rows the streaming source emits, as one batch DataFrame —
    the parity side of the stream-equals-batch test.  Test-scale only
    (driver-side generation)."""
    n = int(options.get("n_events", "2000"))
    n_keys = int(options.get("n_keys", "200"))
    seed = int(options.get("seed", "42"))
    tp = int(options.get("topic_partitions", "1"))
    nt = int(options.get("n_tables", "0"))
    ef = int(options.get("evolve_from", "-1"))
    if tp > 1:
        rows = [
            _wire_event_mp(p, j, tp, n_keys, seed, n_tables=nt, evolve_from=ef)
            for p in range(tp)
            for j in range(n // tp)
        ]
    else:
        rows = [
            _wire_event(i, n_keys, seed, n_tables=nt, evolve_from=ef)
            for i in range(n)
        ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


#: image schema of the simulated stream (PipelineConfig.image_columns)
SIM_IMAGE_COLUMNS = {"uid": "N", "name": "S", "val": "N"}

#: envelope of a routed (multi-table) wire value
_ROUTED_ENVELOPE_DDL = (
    "op string, commit_seq long, schema_name string, table_name string, "
    "keys_json string, image string"
)


def unwrap_wire_envelope(routed: bool = False):
    """Pure column transform: Kafka wire rows → envelope rows.

    One ``from_json`` over ``value`` — usable directly on the STREAMING
    DataFrame (``run_stream(stream_transform=...)``), so micro-batches
    reach the pipeline already envelope-shaped and the DEFAULT decode path
    runs: compiled JVM image decode, additive column discovery
    (schema evolution), the keys-only touched-bucket/skew prescan, and
    auto-salting all apply to the wire transport unchanged.  ``routed=True``
    keeps the in-value ``schema_name``/``table_name`` for multi-table
    fan-out topics.
    """
    ddl = _ROUTED_ENVELOPE_DDL if routed else _ENVELOPE_DDL

    def unwrap(df: DataFrame) -> DataFrame:
        return df.select(
            F.from_json(F.col("value").cast("string"), ddl).alias("e")
        ).select("e.*")

    return unwrap


def make_kafka_cdc_decoder(image_columns: dict[str, str]):
    """Dialect decoder for Kafka-wire envelopes (``PipelineConfig.decoder``).

    One ``from_json`` unwraps ``value`` into the envelope columns, then the
    compiled JVM image decode produces the typed payload — the same
    Python-worker-free decode chain as the file path, applied to the wire
    shape a real `format("kafka")` reader delivers unchanged.
    """
    from commons_codec_spark.functions.dynamodb import compile_direct_decoder

    def decode(batch: DataFrame) -> DataFrame:
        env = batch.select(
            F.from_json(F.col("value").cast("string"), _ENVELOPE_DDL).alias("e")
        ).select("e.*")
        # deletes carry no image: decode the keys from keys_json so the
        # fold sees typed key columns (same coalesce as the default path)
        env = env.withColumn("image", F.coalesce("image", "keys_json"))
        return compile_direct_decoder(env, "image", image_columns)

    return decode
