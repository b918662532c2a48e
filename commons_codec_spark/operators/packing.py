"""Sequence packing: assign documents to fixed-budget training bins.

Pre-training dataloaders pack documents into fixed-length sequences to
avoid padding waste.  Exact bin packing is NP-hard and inherently
sequential; the distributed-standard approximation used here is
SHARD-LOCAL NEXT-FIT: documents are deterministically sharded (hash), and
within each shard a running-sum window assigns consecutive documents to
bins of ``budget`` capacity.  Shard-locality is what makes it scale —
each shard's window sorts independently (no global order, which training
doesn't need anyway), so the plan is one hash shuffle + per-shard sort,
no driver involvement.

``bin_id = floor((running_sum - size) / budget)`` — offset binning: a
document belongs to the bin its START offset falls in, so a bin may
overflow by its last document's tail (training loaders truncate at the
boundary, standard practice), and a document larger than the whole
budget occupies several bins' worth of offsets (later bin ids skip
accordingly); it is flagged ``oversize`` for the caller to truncate or
pre-split — see :func:`~.text.chunk_by_tokens`.  Deterministic:
ordering inside a shard is (size desc, id), so the same corpus packs
identically on any cluster.  The arithmetic is plain integer window
math, stated identically by the SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 64,
    shard_expr=None,
) -> DataFrame:
    """Assign each row a (shard, bin_id) under ``budget`` capacity.

    Returns the input columns + ``shard`` + ``bin_id`` + ``oversize``.
    ``shard_expr`` overrides the default xxhash64 shard assignment (e.g.
    a plain modulo when a SQL oracle must state the identical shard).
    """
    shard = (
        shard_expr
        if shard_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_shards)))
    )
    w = Window.partitionBy("shard").orderBy(
        F.col(size_col).desc(), F.col(id_col)
    )
    run = F.sum(F.col(size_col)).over(w)
    return (
        df.withColumn("shard", shard)
        .withColumn(
            "bin_id",
            F.floor((run - F.col(size_col)) / F.lit(int(budget))).cast("long"),
        )
        .withColumn("oversize", F.col(size_col) > F.lit(int(budget)))
    )


__all__ = ["pack_next_fit"]
