"""Column-expression utilities.

Spark evaluates higher-order-function lambdas without common-subexpression
elimination: every reference to a non-trivial Column inside a lambda (and
every repeated reference to an array expression, e.g. multiple slices)
re-evaluates its whole tree.  ``let`` gives expressions a cheap bound
name — the array-of-one ``transform`` trick: the value is computed once
as the single element, and the lambda body sees it as a
NamedLambdaVariable, which is free to reference any number of times.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once and pass it to ``body`` as a bound variable.

    ``let(expensive, lambda v: f(v, v, v))`` evaluates ``expensive`` one
    time per row, vs three times for ``f(e, e, e)``.
    """
    return F.transform(F.array(value), body)[0]


def dedup_entries_last(arr: Column, key_field: str = "key") -> Column:
    """Keep each key's LAST entry in an array of key/value structs.

    Python-dict assignment semantics for ``map_from_entries`` inputs:
    under the default ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` a duplicate
    key throws DUPLICATED_MAP_KEY and kills the job, so decoders that model
    dict building must dedup explicitly.  Indexed filter with a per-element
    lookahead — entry arrays here are ~10s of elements, so the O(n²)
    scan is trivial; call under :func:`let` so ``arr`` binds once.
    """
    n = F.size(arr)
    return F.filter(
        arr,
        lambda x, i: ~F.exists(
            F.slice(arr, i + 2, F.greatest(n - i - 1, F.lit(0))),
            lambda y: y[key_field] == x[key_field],
        ),
    )
