"""Sequential replay oracle: the reference's apply-in-order semantics.

A plain-Python dict machine mirroring how the reference's relay applies one
SQL statement per event in arrival order
(``/root/reference/examples/mongodb_cdc_cratedb.py:44-48``):

* insert — only if key absent (``ON CONFLICT DO NOTHING``)
* update — full-image replace, only if key present
* delete — remove if present

Used by tests to check the distributed engine's final table state, and by
the bench to verify the replayed sha256 state hash.
"""

from __future__ import annotations

import hashlib
import json


def replay_oracle(events: list[dict], key_fields: list[str]) -> dict:
    """Fold events (sorted by commit_seq, then event_id) into final state.

    Each event: {op, commit_seq, event_id, <key fields>, <payload fields>}.
    Returns {key tuple: row dict (payload incl. _seq)}.
    """
    state: dict = {}
    for ev in sorted(events, key=lambda e: (e["commit_seq"], e["event_id"])):
        key = tuple(ev[k] for k in key_fields)
        op = ev["op"]
        row = {
            k: v
            for k, v in ev.items()
            if k not in ("op", "event_id", "batch_id")
        }
        row["_seq"] = ev["commit_seq"]
        row.pop("commit_seq", None)
        if op == "insert":
            if key not in state:
                state[key] = row
        elif op == "update":
            if key in state:
                state[key] = row
        elif op == "delete":
            state.pop(key, None)
        else:
            raise ValueError(f"unknown op {op}")
    return state


def state_hash(rows: list[dict], columns: list[str]) -> str:
    """Order-insensitive sha256 over selected columns (the parity check).

    Per-row line = JSON array of column values (nulls kept); lines sorted,
    then hashed.  Matches between the Spark table read-back and the oracle.
    """
    lines = sorted(
        json.dumps([row.get(c) for c in columns], separators=(",", ":"), sort_keys=True)
        for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def content_sha256(rows: list[dict]) -> list[str]:
    """Sorted per-row sha256 of `content` (BASELINE.json:15 invariant)."""
    return sorted(
        hashlib.sha256((row.get("content") or "").encode()).hexdigest() for row in rows
    )
