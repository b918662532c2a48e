"""Property-based replay: random op sequences through fold → merge must
equal the sequential dict-machine oracle.

The exhaustive branch sweep (``test_fold_equivalence``) pins every
single-batch fold branch; this test randomizes what that sweep cannot
enumerate — the INTERACTIONS: arbitrary op interleavings per key, random
batch boundaries (cross-batch ordering guard), within-batch arrival
shuffling, salted vs plain folds, at-least-once re-delivery of an earlier
slice under a new batch id, and a mid-replay ``rebucket``.  Any
counterexample hypothesis finds is a real engine bug by construction
(the oracle IS the reference's apply-in-order semantics,
``/root/reference/examples/mongodb_cdc_cratedb.py:44-48``).
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from commons_codec_spark.lake.table import KeyedLakeTable
from commons_codec_spark.operators.cdc_fold import fold_net_changes
from commons_codec_spark.oracle import replay_oracle

KEYS = ["repo", "path"]
OPS = ("insert", "update", "delete")


@st.composite
def scenarios(draw):
    n_keys = draw(st.integers(1, 10))
    ops = draw(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, n_keys - 1)),
            min_size=1,
            max_size=48,
        )
    )
    n = len(ops)
    # consecutive slices (the engine's cross-batch contract: batches arrive
    # in commit order; WITHIN a batch order is free — fold sorts)
    cuts = sorted(draw(st.sets(st.integers(1, max(n - 1, 1)), max_size=3)))
    salt = draw(st.sampled_from([None, 2]))
    rebucket_after = draw(st.integers(-1, len(cuts)))  # -1: never
    # at-least-once: re-deliver one earlier batch (new batch id) at the end
    redeliver = draw(st.integers(-1, len(cuts)))  # -1: no re-delivery
    shuffles = draw(st.randoms(use_true_random=False))
    return n_keys, ops, cuts, salt, rebucket_after, redeliver, shuffles


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(scenarios())
def test_random_replay_matches_dict_machine(spark, tmp_path_factory, sc):
    n_keys, ops, cuts, salt, rebucket_after, redeliver, rng = sc
    events = [
        {
            "op": OPS[o],
            "repo": f"k{k}",
            "path": "p",
            "v": None if OPS[o] == "delete" else f"{k}-{i}",
            "commit_seq": i,
            "event_id": i,
        }
        for i, (o, k) in enumerate(ops)
    ]
    bounds = [0, *cuts, len(events)]
    batches = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ]

    root = tmp_path_factory.mktemp("prop")
    table = KeyedLakeTable.create(
        spark, str(root / "t"), key_schema={"repo": "string", "path": "string"},
        n_buckets=4,
    )

    def apply(batch, batch_id):
        rows = list(batch)
        rng.shuffle(rows)  # within-batch arrival order is arbitrary
        df = spark.createDataFrame(
            [(e["op"], e["repo"], e["path"], e["v"], e["commit_seq"])
             for e in rows],
            "op string, repo string, path string, v string, commit_seq long",
        )
        table.merge(
            fold_net_changes(df, KEYS, ["v"], salt_chunks=salt),
            batch_id=batch_id,
        )

    for i, batch in enumerate(batches):
        apply(batch, i)
        if i == rebucket_after:
            table.rebucket(16 if table.n_buckets == 4 else 4)
    if 0 <= redeliver < len(batches):
        apply(batches[redeliver], batch_id=1000)  # new id: guard must no-op

    engine = {
        (r.repo, r.path): (r.v, r._seq)
        for r in table.read().collect()
    }
    oracle_events = [dict(e) for e in events]
    if 0 <= redeliver < len(batches):
        oracle_events += [dict(e) for e in batches[redeliver]]
    expected = {
        key: (row.get("v"), row["_seq"])
        for key, row in replay_oracle(oracle_events, KEYS).items()
    }
    assert engine == expected
