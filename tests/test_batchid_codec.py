"""Interval compression of the commit's applied-batch-id bookkeeping.

Streaming epoch ids are monotonic, so the commit must stay O(intervals)
(one ``[lo, hi]`` for a healthy stream) instead of an O(n) list rewritten
into every commit — the metadata-path scale property.  These are pure
driver-side unit tests; the engine-level exactly-once behavior rides on
them via test_e2e_replay / test_property_replay.
"""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given

from commons_codec_spark.lake.table import (
    _bid_add,
    _bid_contains,
    _bid_normalize,
    _bid_set,
)


def test_monotonic_ids_stay_one_interval():
    enc: object = []
    for b in range(1000):
        enc = _bid_add(enc, b)
    assert enc == {"ranges": [[0, 999]], "other": []}
    assert _bid_contains(enc, 0) and _bid_contains(enc, 999)
    assert not _bid_contains(enc, 1000) and not _bid_contains(enc, -1)


def test_gaps_and_bridging():
    enc: object = []
    for b in (5, 1, 9, 7):
        enc = _bid_add(enc, b)
    assert enc["ranges"] == [[1, 1], [5, 5], [7, 7], [9, 9]]
    enc = _bid_add(enc, 8)  # bridges 7..9
    assert enc["ranges"] == [[1, 1], [5, 5], [7, 9]]
    enc = _bid_add(enc, 6)  # bridges 5..9
    assert enc["ranges"] == [[1, 1], [5, 9]]
    assert _bid_add(enc, 6) == enc  # re-add is a no-op


def test_legacy_list_and_non_int_ids():
    legacy = [3, 1, 2, "run-2026-08-17", 3]
    enc = _bid_normalize(legacy)
    assert enc == {"ranges": [[1, 3]], "other": ["run-2026-08-17"]}
    assert _bid_contains(legacy, 2) and _bid_contains(legacy, "run-2026-08-17")
    assert not _bid_contains(legacy, "other-run")
    assert _bid_set(enc) == {1, 2, 3, "run-2026-08-17"}
    # bool must not masquerade as int 1
    enc2 = _bid_add([], True)
    assert enc2["ranges"] == [] and enc2["other"] == [True]
    assert not _bid_contains(enc2, 1)


@given(st.lists(st.integers(-50, 50), max_size=60))
def test_codec_equals_set_semantics(ids):
    enc: object = []
    for b in ids:
        enc = _bid_add(enc, b)
    assert _bid_set(enc) == set(ids)
    for b in range(-55, 55):
        assert _bid_contains(enc, b) == (b in set(ids))
    # ranges sorted, disjoint, non-adjacent (maximally coalesced)
    r = _bid_normalize(enc)["ranges"]
    assert all(lo <= hi for lo, hi in r)
    assert all(r[i][1] + 1 < r[i + 1][0] for i in range(len(r) - 1))
