"""Per-key CDC fold: collapse a batch of change events into net changes.

The reference applies events strictly one at a time against the sink
(``/root/reference/examples/mongodb_cdc_cratedb.py:44-48``) with these op
semantics:

* ``insert`` — only if the key is absent (``ON CONFLICT DO NOTHING``,
  ``aws_dms.py:288``, ``dynamodb.py:194``) — re-delivery safe;
* ``update`` — full-image replace, only if the key is present (SQL UPDATE
  of a missing row is a no-op; ``dynamodb.py:198-205``);
* ``delete`` — remove if present (``dynamodb.py:207-210``).

A batch engine cannot apply events one at a time; it must pre-reduce each
micro-batch per key.  Plain last-writer-wins is *wrong* here: a re-delivered
``insert`` over an existing key must NOT replace it.  Instead we fold the
per-key event sequence (ordered by ``commit_seq``) through the op state
machine — but the batch outcome depends on whether the key already exists
in the target, which we don't know until merge time.  So the fold tracks
**both branches** simultaneously:

* ``aa/arow/aseq`` — net action had the key been absent before the batch
* ``pa/prow/pseq`` — net action had the key been present

Actions: 0 = KEEP (no change), 1 = SET(row), 2 = DELETE.  At merge time the
target side picks the branch (see ``lake.table.KeyedLakeTable.merge``).

The fold runs entirely JVM-side: ``collect_list(struct(...))`` →
``array_sort`` → ``F.aggregate`` with ``when`` expressions.  No Python.

The fold is **associative**: two folds over consecutive seq ranges compose
(apply the later fold starting from the earlier fold's outcome per branch).
That gives the skew weapon the north rule demands: for hot keys (a repo
with millions of change events), :func:`fold_net_changes` with
``salt_chunks`` splits each key's events into seq-range chunks, folds the
chunks in parallel (phase 1), then composes the per-chunk states (phase 2)
— a two-phase reduce that bounds per-task state regardless of key skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame, Window

KEEP, SET, DELETE = 0, 1, 2

#: Normalized op vocabulary expected in the input (see functions.dms.normalize_op).
OPS = ("insert", "update", "delete")


def _payload_struct(df: DataFrame, payload_cols: list[str]) -> T.StructType:
    fields = {f.name: f for f in df.schema.fields}
    return T.StructType([fields[c] for c in payload_cols])


def _step(acc: Column, ev: Column, payload_type: T.StructType) -> Column:
    """One event through the two-branch state machine."""

    def branch(action, row, seq, present_now):
        is_ins = (ev["op"] == "insert") & ~present_now
        is_upd = (ev["op"] == "update") & present_now
        # deletes are unconditionally effective: a delete of an absent key
        # still records a tombstone action/seq, so a later-arriving batch
        # carrying an OLDER insert cannot resurrect the key (the lake's
        # ordering guard compares against the tombstone seq).  Read-state
        # semantics are unchanged (reference: delete-missing is a no-op).
        # Growth bound: tombstones for never-stored keys accumulate until
        # KeyedLakeTable.compact_tombstones drops those older than the
        # source's out-of-order horizon.
        is_del = ev["op"] == "delete"
        new_action = (
            F.when(is_ins | is_upd, F.lit(SET))
            .when(is_del, F.lit(DELETE))
            .otherwise(action)
        )
        changed = is_ins | is_upd | is_del
        new_row = (
            F.when(is_ins | is_upd, ev["row"])
            .when(is_del, F.lit(None).cast(payload_type))
            .otherwise(row)
        )
        new_seq = F.when(changed, ev["seq"]).otherwise(seq)
        return new_action, new_row, new_seq

    aa, arow, aseq = branch(
        acc["aa"], acc["arow"], acc["aseq"], present_now=acc["aa"] == SET
    )
    pa, prow, pseq = branch(
        acc["pa"], acc["prow"], acc["pseq"], present_now=acc["pa"] != DELETE
    )
    return F.struct(
        aa.alias("aa"), arow.alias("arow"), aseq.alias("aseq"),
        pa.alias("pa"), prow.alias("prow"), pseq.alias("pseq"),
    )


def _compose(s1: Column, s2: Column) -> Column:
    """Compose two fold states over consecutive seq ranges (s1 earlier)."""

    def pick(action1, row1, seq1, present_after_1):
        # choose s2's branch according to presence after s1
        a2 = F.when(present_after_1, s2["pa"]).otherwise(s2["aa"])
        r2 = F.when(present_after_1, s2["prow"]).otherwise(s2["arow"])
        q2 = F.when(present_after_1, s2["pseq"]).otherwise(s2["aseq"])
        keep = a2 == KEEP
        return (
            F.when(keep, action1).otherwise(a2),
            F.when(keep, row1).otherwise(r2),
            F.when(keep, seq1).otherwise(q2),
        )

    aa, arow, aseq = pick(s1["aa"], s1["arow"], s1["aseq"], s1["aa"] == SET)
    pa, prow, pseq = pick(s1["pa"], s1["prow"], s1["pseq"], s1["pa"] != DELETE)
    return F.struct(
        aa.alias("aa"), arow.alias("arow"), aseq.alias("aseq"),
        pa.alias("pa"), prow.alias("prow"), pseq.alias("pseq"),
    )


def _init_state(payload_type: T.StructType) -> Column:
    null_row = F.lit(None).cast(payload_type)
    return F.struct(
        F.lit(KEEP).alias("aa"), null_row.alias("arow"),
        F.lit(-1).cast("long").alias("aseq"),
        F.lit(KEEP).alias("pa"), null_row.alias("prow"),
        F.lit(-1).cast("long").alias("pseq"),
    )


#: Memoized fold/compose aggregate Columns.  Building the `_step` tree costs
#: ~2s of driver-side Python (hundreds of column-API calls) — repeated per
#: micro-batch it serializes the whole pipeline (measured: the single
#: largest non-scaling cost at small batch sizes).  Column objects are
#: immutable unresolved expressions, so one instance is reusable across any
#: DataFrame with the same schema.
_AGG_CACHE: dict = {}


def _fold_agg(ptype: T.StructType, seq_col: str, op_col: str, payload_cols: list[str]) -> Column:
    key = ("fold", ptype.json(), seq_col, op_col, tuple(payload_cols))
    col = _AGG_CACHE.get(key)
    if col is None:
        ev = F.struct(
            F.col(seq_col).cast("long").alias("seq"),
            F.col(op_col).alias("op"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("row"),
        )
        col = F.aggregate(
            F.array_sort(F.collect_list(ev)),
            _init_state(ptype),
            lambda acc, x: _step(acc, x, ptype),
        ).alias("__state")
        _AGG_CACHE[key] = col
    return col


def _compose_agg(ptype: T.StructType) -> Column:
    key = ("compose", ptype.json())
    col = _AGG_CACHE.get(key)
    if col is None:
        st = F.struct(F.col("__chunk").alias("c"), F.col("__state").alias("s"))
        col = F.aggregate(
            F.array_sort(F.collect_list(st)),
            _init_state(ptype),
            lambda acc, x: _compose(acc, x["s"]),
        ).alias("__state")
        _AGG_CACHE[key] = col
    return col


def _closed_form_cols(
    ptype: T.StructType,
    keys: tuple[str, ...],
    payload_cols: tuple[str, ...],
    seq_col: str,
    op_col: str,
):
    """Memoized column lists for :func:`_fold_closed_form`.

    Building the annotated/agg/output expression trees costs ~0.25 s of
    serial driver Python per call (hundreds of Column-API py4j round
    trips) — and every micro-batch folds at least once, so an engine
    lifecycle query paid it 2–4×.  The trees depend only on the schema
    shape (same argument as ``_AGG_CACHE`` / the merge-expression cache:
    Columns are immutable unresolved expressions, reusable across any
    DataFrame with the same columns), so one instance serves every batch.
    """
    key = ("closed", ptype.json(), keys, payload_cols, seq_col, op_col)
    hit = _AGG_CACHE.get(key)
    if hit is not None:
        return hit

    op = F.col(op_col)
    seq = F.col(seq_col).cast("long")
    is_i, is_u, is_d = op == "insert", op == "update", op == "delete"

    w = (
        Window.partitionBy(*keys)
        .orderBy(seq, op)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_insdel = F.last(F.when(~is_u, op), ignorenulls=True).over(w)

    pb_a = F.coalesce(prev_insdel == "insert", F.lit(False))  # absent start
    pb_p = F.coalesce(prev_insdel == "insert", F.lit(True))  # present start
    row = F.struct(*[F.col(c) for c in payload_cols])

    annotated_cols = [
        *keys,
        seq.alias("__seq"),
        F.when(~is_u, op).alias("__insdel"),
        ((is_i & ~pb_a) | (is_u & pb_a)).alias("__set_a"),
        is_d.alias("__del_a"),  # deletes always tombstone — see _step
        ((is_i & ~pb_p) | (is_u & pb_p)).alias("__set_p"),
        is_d.alias("__del_p"),
        row.alias("__row"),
    ]

    def series(flag: str):
        cond = F.col(flag)
        return (
            F.max_by(F.when(cond, F.col("__row")), F.when(cond, F.col("__seq"))),
            F.max(F.when(cond, F.col("__seq"))),
        )

    agg_cols = [
        F.max_by("__insdel", F.when(F.col("__insdel").isNotNull(), F.col("__seq"))).alias("__final_insdel"),
        *[
            c.alias(n)
            for flag, pre in (("__set_a", "a"), ("__set_p", "p"))
            for c, n in zip(series(flag), (f"__{pre}row", f"__{pre}set_seq"))
        ],
        F.max(F.when(F.col("__del_a"), F.col("__seq"))).alias("__adel_seq"),
        F.max(F.when(F.col("__del_p"), F.col("__seq"))).alias("__pdel_seq"),
    ]

    presence_a = F.coalesce(F.col("__final_insdel") == "insert", F.lit(False))
    presence_p = F.coalesce(F.col("__final_insdel") == "insert", F.lit(True))
    null_row = F.lit(None).cast(ptype)
    pa_set = presence_p & F.col("__pset_seq").isNotNull()
    aseq = F.coalesce(
        F.when(presence_a, F.col("__aset_seq")).otherwise(F.col("__adel_seq")),
        F.lit(-1).cast("long"),
    )
    pseq = F.coalesce(
        F.when(~presence_p, F.col("__pdel_seq")).otherwise(F.col("__pset_seq")),
        F.lit(-1).cast("long"),
    )
    # Compact row encoding (see fold_net_changes): ONE payload struct per
    # key plus a rarely-non-null present-branch extra.  aa==SET ⟺
    # presence_a, and then __arow is the absent branch's row; the branches'
    # rows can only differ when their last effective sets are different
    # events, i.e. different seqs (an out-of-order insert after updates in
    # one batch).
    divergent = presence_a & pa_set & (F.col("__aset_seq") != F.col("__pset_seq"))
    out_cols = [
        *keys,
        F.when(presence_a, F.lit(SET))
        .when(F.col("__adel_seq").isNotNull(), F.lit(DELETE))
        .otherwise(F.lit(KEEP))
        .alias("aa"),
        aseq.alias("aseq"),
        F.when(~presence_p, F.lit(DELETE))
        .when(F.col("__pset_seq").isNotNull(), F.lit(SET))
        .otherwise(F.lit(KEEP))
        .alias("pa"),
        pseq.alias("pseq"),
        F.when(presence_a, F.col("__arow"))
        .when(pa_set, F.col("__prow"))
        .otherwise(null_row)
        .alias("row"),
        F.when(divergent, F.col("__prow")).otherwise(null_row).alias("prow_extra"),
    ]
    out = (annotated_cols, agg_cols, out_cols)
    _AGG_CACHE[key] = out
    return out


def _fold_closed_form(
    events: DataFrame,
    keys: list[str],
    payload_cols: list[str],
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """The fold as window + hash aggregation (whole-stage codegen, no arrays).

    Closed form of the state machine: presence after any event prefix equals
    "the last insert/delete op in the prefix is an insert" (falling back to
    the branch's starting presence when the prefix has no insert/delete) —
    inserts from present and deletes from absent are no-ops, so the raw
    insert/delete subsequence collapses to an alternating effective sequence
    whose final element is simply the last raw insert/delete.  Given per-event
    presence-before (one ``last() ignore nulls`` window), event effectiveness
    is a local predicate and the branch outcomes reduce with ``max_by``:

    * effective set   = insert∧¬present-before ∨ update∧present-before
    * effective delete= delete∧present-before
    * final action    = SET if final presence ∧ any effective set,
                        DELETE if a delete flipped final presence off,
                        else KEEP; row/seq from the max_by over effective
                        events.

    vs the sequential ``collect_list → aggregate`` formulation this is
    ~10× faster (interpreted HOF → codegen) and needs no per-key buffer:
    the aggregation is partial (map-side combine), so a hot key costs one
    sort-run in the window, not an O(events) array in one task.

    The three expression lists are memoized per schema shape
    (:func:`_closed_form_cols`) — rebuilding them cost ~0.25 s of serial
    driver Python per fold call, paid once per micro-batch.
    """
    annotated_cols, agg_cols, out_cols = _closed_form_cols(
        _payload_struct(events, payload_cols),
        tuple(keys), tuple(payload_cols), seq_col, op_col,
    )
    return events.select(*annotated_cols).groupBy(*keys).agg(*agg_cols).select(
        *out_cols
    )


def fold_net_changes(
    events: DataFrame,
    keys: list[str],
    payload_cols: list[str],
    seq_col: str = "commit_seq",
    op_col: str = "op",
    salt_chunks: int | None = None,
    hot_keys: list[tuple] | None = None,
) -> DataFrame:
    """Collapse events into one net-change row per key.

    Returns ``keys + [aa, aseq, pa, pseq, row, prow_extra]``: the two
    branch actions/seqs plus a **single** payload struct.  ``row`` is the
    absent branch's row when ``aa == SET``, else the present branch's when
    ``pa == SET``.  The branches carry different rows only when an insert
    arrives after updates of the same key within one batch (out-of-order
    redelivery) — then ``prow_extra`` holds the present branch's row, NULL
    otherwise.  One payload copy instead of two halves the net-change
    bytes shuffled into the merge join (the payload — source-code content —
    dominates row width).

    Default path: the closed-form window+max_by fold
    (:func:`_fold_closed_form` — codegen, partial aggregation).

    ``salt_chunks``: if set, events are first folded per (key, seq-range
    chunk) and the chunk states composed per key — two shuffles but bounded
    per-task state under hot-key skew (north rule: explicit skew handling).
    Chunk boundaries follow seq ranges so composition order is preserved.
    Phase 1 runs the same codegen closed form as the unsalted path (the
    chunk id simply joins the window/grouping key, splitting a hot key's
    sort-run across tasks); only phase 2's per-key composition — at most
    ``salt_chunks`` states per key — uses the interpreted HOF aggregate.

    ``hot_keys``: TARGETED salting — only these keys (tuples in ``keys``
    order) get seq-chunked; every other key folds in one chunk and its
    phase-1 row passes through with no composition at all.  Measured at
    8M events / 2.4M-event hot key / local[32] (interleaved min-of-3):
    the unsalted fold pays a ~1.4× straggler over the uniform log;
    GLOBAL chunking made it *worse* (chunk-spread multiplies every cold
    key's net rows and every key pays the HOF compose); targeted
    chunking with the phase-1 output persisted beats unsalted by ~1.6×
    (27.7 s → 17.4 s at 4M events) with bit-identical final state.
    The persist matters: the cold/hot union consumes phase-1 twice, and
    without it the window sort re-executes per branch, costing as much
    as the straggler it removes.
    """
    if not salt_chunks:
        return _fold_closed_form(events, keys, payload_cols, seq_col, op_col)
    # Chunk by seq range so that chunk order == seq order.  Quantile-free:
    # derive the chunk from the global seq span (cheap agg, broadcast as
    # literals).
    lo, hi = events.select(
        F.min(seq_col).cast("long"), F.max(seq_col).cast("long")
    ).first()
    span = max(int(hi or 0) - int(lo or 0) + 1, 1)
    width = max(span // salt_chunks, 1)
    chunk = ((F.col(seq_col).cast("long") - F.lit(int(lo or 0))) / width).cast(
        "long"
    )
    if hot_keys is None:
        # blanket salting: every key chunked + composed
        partial = _fold_closed_form(
            events.withColumn("__chunk", chunk),
            keys + ["__chunk"], payload_cols, seq_col, op_col,
        )
        return compose_net_changes(partial, keys, version_col="__chunk")
    if not hot_keys:
        return _fold_closed_form(events, keys, payload_cols, seq_col, op_col)

    key_struct = F.struct(*[F.col(k) for k in keys])
    hot_lit = F.array(
        *[
            F.struct(*[F.lit(v).alias(k) for k, v in zip(keys, kt)])
            for kt in hot_keys
        ]
    )
    # array_contains is NULL (not false) when any key field is NULL, and a
    # NULL predicate fails BOTH filter(is_hot) and filter(~is_hot) — NULL-key
    # rows would vanish from the salted path while the unsalted path folds
    # them.  Coalesce to false so they deterministically take the cold branch.
    is_hot = F.coalesce(F.array_contains(hot_lit, key_struct), F.lit(False))
    partial = _fold_closed_form(
        events.withColumn("__chunk", F.when(is_hot, chunk).otherwise(F.lit(0))),
        keys + ["__chunk"], payload_cols, seq_col, op_col,
    )
    # The union below consumes `partial` twice; without a persist the
    # shuffle is reused but the window sort + aggregation re-execute per
    # branch — measured to cost as much as the straggler it removes.
    # Persisting the (compact, already-folded) phase-1 output keeps the
    # expensive pass single; ContextCleaner reclaims the cache when the
    # fold output goes out of scope after the merge.
    partial = partial.persist()
    # cold keys fold entirely inside chunk 0 — their phase-1 row IS the
    # final net row; only the hot keys' (≤ len(hot_keys) × salt_chunks)
    # rows go through composition
    cold = partial.filter(~is_hot).drop("__chunk")
    hot = compose_net_changes(partial.filter(is_hot), keys, "__chunk")
    return cold.unionByName(hot)


def _compact_state(out: DataFrame, keys: list[str], ptype: T.StructType) -> DataFrame:
    """Re-encode a ``__state`` two-branch struct into the compact net-row
    shape merge() consumes (keys + aa/aseq/pa/pseq/row/prow_extra)."""
    s = F.col("__state")
    aa, pa = s["aa"], s["pa"]
    divergent = (aa == SET) & (pa == SET) & (s["aseq"] != s["pseq"])
    null_row = F.lit(None).cast(ptype)
    return out.select(
        *keys,
        aa.alias("aa"),
        s["aseq"].alias("aseq"),
        pa.alias("pa"),
        s["pseq"].alias("pseq"),
        F.when(aa == SET, s["arow"])
        .when(pa == SET, s["prow"])
        .otherwise(null_row)
        .alias("row"),
        F.when(divergent, s["prow"]).otherwise(null_row).alias("prow_extra"),
    )


def compose_net_changes(
    changes: DataFrame,
    keys: list[str],
    version_col: str = "_version",
) -> DataFrame:
    """Compose net-change rows from CONSECUTIVE fold outputs into one.

    Input: rows in the compact net encoding (keys + aa/aseq/pa/pseq/row/
    prow_extra), each tagged with a monotone ``version_col`` — exactly
    what ``KeyedLakeTable.read_changes(since, to)`` returns.  The fold is
    associative, so a change-feed *range* collapses to one net row per
    key by composing the per-version states in version order — a replica
    then applies the whole tail in ONE merge (one shuffle + one join)
    instead of one merge per version.

    The compact encoding is first re-inflated to the two-branch state:
    ``arow`` is ``row`` when ``aa == SET``; ``prow`` is ``prow_extra``
    when the branches diverged (non-null by construction exactly then),
    else ``row`` when ``pa == SET``.
    """
    ptype = changes.schema["row"].dataType
    aa, pa = F.col("aa"), F.col("pa")
    null_row = F.lit(None).cast(ptype)
    state = F.struct(
        aa.alias("aa"),
        F.when(aa == SET, F.col("row")).otherwise(null_row).alias("arow"),
        F.col("aseq").alias("aseq"),
        pa.alias("pa"),
        F.coalesce(
            F.col("prow_extra"), F.when(pa == SET, F.col("row"))
        ).alias("prow"),
        F.col("pseq").alias("pseq"),
    )
    out = (
        changes.select(
            *keys,
            F.col(version_col).cast("long").alias("__chunk"),
            state.alias("__state"),
        )
        .groupBy(*keys)
        .agg(_compose_agg(ptype))
    )
    return _compact_state(out, keys, ptype)
