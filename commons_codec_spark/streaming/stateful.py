"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no state store (state lives in the sink DB); a
distributed stream needs operator state for anything that must remember
across micro-batches without a round-trip to the lake.  First use case:
**streaming first-seen dedup** — emit a record only the first time its
fingerprint appears anywhere in the stream, the cross-batch complement of
the batch dedup operators in ``operators/dedup.py``.

State design for 10^10 events: state is keyed by the fingerprint (so the
shuffle spreads it), each key stores a single boolean-sized marker, and
the store is RocksDB-backed on a real cluster
(``spark.sql.streaming.stateStore.providerClass``); memory per executor is
therefore O(distinct keys / executors), not O(events).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def dedup_stream(
    df: DataFrame,
    fingerprint_col: str,
    output_schema: T.StructType | str,
) -> DataFrame:
    """Keep only the first occurrence of each ``fingerprint_col`` value
    across the whole stream (micro-batch boundaries included).

    Rows within one batch for the same fingerprint also collapse to the
    first (by arrival inside the Arrow group).  Output columns = input
    columns (pass ``df.schema`` as ``output_schema``).
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[[0]]
                break
        state.update((True,))
        if first is not None:
            yield first

    return df.groupBy(fingerprint_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
