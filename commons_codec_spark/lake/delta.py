"""Delta Lake implementation of the :class:`~.interface.LakeSink` seam.

The sandbox has no ``delta-spark`` jars, so this module is the typed,
import-gated skeleton of the mapping documented in
:mod:`.interface` — constructing it raises a clear ImportError unless the
package is present, and every method states the exact Delta call it
compiles to.  The decode/fold logic upstream is unchanged: the fold's
compact net encoding (keys + aa/aseq/pa/pseq/row/prow_extra) is already
the ideal MERGE source — one row per key, both presence branches
precomputed, ordering guards as plain column predicates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from commons_codec_spark.operators.cdc_fold import DELETE, SET

SEQ_COL = "_seq"


class DeltaLakeTable:
    """Keyed Delta table with idempotent two-branch MERGE (LakeSink).

    Requires ``delta-spark`` (``pip install delta-spark`` and
    ``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension``).
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as exc:  # pragma: no cover — jars absent here
            raise ImportError(
                "DeltaLakeTable needs the delta-spark package; in this "
                "environment use KeyedLakeTable (same LakeSink surface). "
                "The merge/CDF mapping below is the deployment recipe."
            ) from exc
        self.spark = spark
        self.path = path
        self.keys = list(keys)

    # -- LakeSink surface ---------------------------------------------------

    def merge(
        self, net: DataFrame, batch_id=None, touched: list[int] | None = None
    ) -> dict:  # pragma: no cover — needs delta-spark
        """The two-branch fold merge as one ``DeltaTable.merge``:

        .. code-block:: python

            from delta.tables import DeltaTable

            t = DeltaTable.forPath(self.spark, self.path)
            cond = " AND ".join(f"t.{k} <=> s.{k}" for k in self.keys)
            (t.alias("t").merge(net.alias("s"), cond)
             # present branch: replace when newer (LWW ordering guard)
             .whenMatchedUpdate(
                 condition=f"s.pa = {SET} AND s.pseq > t.{SEQ_COL}",
                 set={**{c: f"coalesce(s.prow_extra.{c}, s.row.{c})"
                         for c in payload_cols},
                      SEQ_COL: "s.pseq"})
             # present branch: delete when a newer tombstone arrives
             .whenMatchedDelete(
                 condition=f"s.pa = {DELETE} AND s.pseq > t.{SEQ_COL}")
             # absent branch: insert only what the batch net-creates
             .whenNotMatchedInsert(
                 condition=f"s.aa = {SET}",
                 values={**{k: f"s.{k}" for k in self.keys},
                         **{c: f"s.row.{c}" for c in payload_cols},
                         SEQ_COL: "s.aseq"})
             .execute())

        Exactly-once: run inside a Delta idempotent write
        (``spark.databricks.delta.write.txnAppId`` = pipeline id,
        ``txnVersion`` = ``batch_id``) so a replayed micro-batch no-ops —
        the applied-batch-id analog.  Schema evolution: enable
        ``spark.databricks.delta.schema.autoMerge.enabled`` so additive
        ``row`` fields (the north rule's ``lang``) widen the table.
        ``touched`` maps to partition/file pruning Delta performs from the
        MERGE condition's min/max stats; no manual hint needed.

        NOTE vs the custom lake: Delta MERGE keeps no tombstones, so the
        out-of-order guard for deletes of keys that arrive later must
        keep tombstone ROWS instead (add a ``_deleted`` column and filter
        in ``read``) when the source can reorder past the retention
        horizon — identical semantics to KeyedLakeTable then.
        """
        raise ImportError("delta-spark not installed")

    def read(self, **kwargs) -> DataFrame:  # pragma: no cover
        return self.spark.read.format("delta").load(self.path)

    def read_changes(self, since_version: int = 1, to_version: int | None = None
                     ) -> DataFrame:  # pragma: no cover
        """Delta Change Data Feed::

            spark.read.format("delta").option("readChangeFeed", "true")
                 .option("startingVersion", since_version)
                 .option("endingVersion", to_version).load(self.path)

        (requires ``delta.enableChangeDataFeed=true`` on the table).
        """
        raise ImportError("delta-spark not installed")

    def applied_batch_ids(self) -> set:  # pragma: no cover
        """From commit metadata: ``DESCRIBE HISTORY`` → ``txnVersion``s
        recorded by the idempotent writes."""
        raise ImportError("delta-spark not installed")

    def is_applied(self, batch_id) -> bool:  # pragma: no cover
        """``txnVersion <= latest stored txnVersion`` for this
        ``txnAppId`` (Delta's idempotent-write watermark — monotonic
        streaming epoch ids make the membership check one comparison)."""
        raise ImportError("delta-spark not installed")

    def version(self) -> int:  # pragma: no cover
        raise ImportError("delta-spark not installed")

    def drop_data(self) -> None:  # pragma: no cover
        """``DELETE FROM delta.`path``` — new snapshot, history kept."""
        raise ImportError("delta-spark not installed")

    def bucket_of(self, *key_cols: Column) -> Column:
        """Delta clusters via OPTIMIZE/ZORDER, not static buckets; the
        touched-hint optimization is inapplicable, so hash to a single
        pseudo-bucket (a superset-safe constant)."""
        return F.lit(0)

    def vacuum(self, keep_last: int = 2) -> None:  # pragma: no cover
        """``VACUUM delta.`path` RETAIN <hours>``."""
        raise ImportError("delta-spark not installed")


__all__ = ["DeltaLakeTable"]
