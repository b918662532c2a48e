"""Closed-form fold ≡ sequential-aggregate fold, exhaustively.

The engine's hot path is `_fold_closed_form` (window + max_by, codegen);
the salted two-phase path still composes `_step` states.  Both implement
the same two-branch state machine — this test pins them together over
every op sequence up to length 4 plus random longer ones, comparing the
full (aa, arow, aseq, pa, prow, pseq) tuples.
"""

import itertools
import random

import pyspark.sql.functions as F

from commons_codec_spark.operators.cdc_fold import (
    _fold_agg,
    _fold_closed_form,
    _payload_struct,
)

OPS = ("insert", "update", "delete")


def _event_rows():
    rows, key_i = [], 0
    for length in range(1, 5):
        for combo in itertools.product(OPS, repeat=length):
            key = f"k{key_i}"
            key_i += 1
            for j, o in enumerate(combo):
                rows.append((o, key, "p", f"c{j}", f"body{j}", j * 10 + key_i))
    rng = random.Random(0)
    for _ in range(150):
        key = f"k{key_i}"
        key_i += 1
        for j in range(rng.randint(5, 12)):
            rows.append((rng.choice(OPS), key, "p", f"c{j}", f"b{j}", j * 7 + key_i))
    return rows


def test_closed_form_fold_equals_sequential_fold(spark):
    df = spark.createDataFrame(
        _event_rows(),
        "op string, repo string, path string, commit string, content string, "
        "commit_seq long",
    )
    payload = ["commit", "content"]
    ptype = _payload_struct(df, payload)
    legacy = (
        df.groupBy("repo", "path")
        .agg(_fold_agg(ptype, "commit_seq", "op", payload))
        .select(
            "repo", "path",
            F.col("__state.aa").alias("aa"), F.col("__state.arow").alias("arow"),
            F.col("__state.aseq").alias("aseq"), F.col("__state.pa").alias("pa"),
            F.col("__state.prow").alias("prow"), F.col("__state.pseq").alias("pseq"),
        )
    )
    new = _fold_closed_form(df, ["repo", "path"], payload, "commit_seq", "op")

    def compact_from_state(r):
        """Derive the compact (row, prow_extra) encoding from the full
        two-branch state — the contract fold_net_changes now emits."""
        arow = tuple(r.arow) if r.arow else None
        prow = tuple(r.prow) if r.prow else None
        row = arow if r.aa == 1 else (prow if r.pa == 1 else None)
        extra = prow if (r.aa == 1 and r.pa == 1 and r.aseq != r.pseq) else None
        return (r.aa, r.aseq, r.pa, r.pseq, row, extra)

    left = {(r.repo, r.path): compact_from_state(r) for r in legacy.collect()}
    right = {
        (r.repo, r.path): (
            r.aa, r.aseq, r.pa, r.pseq,
            tuple(r.row) if r.row else None,
            tuple(r.prow_extra) if r.prow_extra else None,
        )
        for r in new.collect()
    }
    assert left.keys() == right.keys()
    mismatches = {k: (left[k], right[k]) for k in left if left[k] != right[k]}
    assert not mismatches, f"{len(mismatches)} mismatching keys: {list(mismatches.items())[:3]}"
    # the encoding must exercise both the shared-row and the divergent case
    assert any(v[4] is not None for v in right.values())
    assert any(v[5] is not None for v in right.values()), (
        "no divergent (prow_extra) case in the exhaustive sweep"
    )
