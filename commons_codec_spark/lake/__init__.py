"""Keyed lake table: the engine's Iceberg-style MERGE sink.

No Iceberg/Delta jars ship in this environment, so the sink is a faithful
miniature: a bucket-partitioned copy-on-write parquet table with an atomic
commit log and batch-id idempotence.  On a real cluster the `merge` call
maps 1:1 onto `MERGE INTO <iceberg table> ON t.repo=s.repo AND t.path=s.path
WHEN MATCHED ...` — the physical shape (hash-bucketed layout, merge touches
only buckets containing changed keys, snapshot isolation, idempotent
commits) is the same one Iceberg uses.
"""

from commons_codec_spark.lake.interface import LakeSink  # noqa: F401
from commons_codec_spark.lake.table import KeyedLakeTable  # noqa: F401
