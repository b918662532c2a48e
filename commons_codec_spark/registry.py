"""Driver-side schema registry: the stateful control plane of the stream.

The reference mutates per-table schema state while consuming events:
``create-table`` control events append learned primary keys
(``aws_dms.py:133-144``), ``drop-table`` restores the caller-seeded state
(``aws_dms.py:175-178,443-445``), and per-column MAP/OBJECT annotations
drive JSON re-parsing (``model.py:47-79``).

In the Spark engine this state lives on the driver, is consulted when
planning each micro-batch (data events depend on previously seen control
events), and is persisted as JSON **next to the streaming checkpoint** so a
kill-and-resume continues with the same schema knowledge.  Persistence is
batch-id-versioned and written atomically (tmp + rename) — replaying a
micro-batch after a crash re-applies the same control events and converges
to the same registry state (idempotent).
"""

from __future__ import annotations

import copy
import json
import os
from dataclasses import dataclass, field


@dataclass
class TableState:
    primary_keys: list[str] = field(default_factory=list)
    column_types: dict[str, str] = field(default_factory=dict)  # col -> map|object
    ignore_ddl: bool = False
    exists: bool = True
    extra_columns: list[str] = field(default_factory=list)  # additive evolution log


class SchemaRegistry:
    """Per-table schema knowledge, with drop-time reset semantics."""

    def __init__(self, seed: dict[str, TableState] | None = None):
        self._tables: dict[str, TableState] = seed or {}
        # Caller-provided snapshot, restored on drop-table
        # (reference: aws_dms.py:443-445, test_aws_dms_universal.py:262-271).
        self._caller_seed = copy.deepcopy(self._tables)

    @staticmethod
    def address(schema: str, table: str) -> str:
        return f"{schema}:{table}"

    def get(self, schema: str, table: str) -> TableState:
        return self._tables.setdefault(self.address(schema, table), TableState())

    def primary_keys(self, schema: str, table: str) -> list[str]:
        return self.get(schema, table).primary_keys

    # -- control-event application ------------------------------------------------

    def seed(
        self,
        schema: str,
        table: str,
        primary_keys: list[str] | None = None,
        column_types: dict[str, str] | None = None,
        ignore_ddl: bool | None = None,
    ) -> TableState:
        """Caller-provided schema knowledge (the reference's constructor
        stores: PrimaryKeyStore / ColumnTypeMapStore / ignore_ddl,
        ``aws_dms.py:431-445``).  Seeded state is also what ``drop-table``
        restores, so it is recorded in the caller snapshot too.
        """
        state = self.get(schema, table)
        if primary_keys is not None:
            state.primary_keys = list(primary_keys)
        if column_types is not None:
            state.column_types.update(column_types)
        if ignore_ddl is not None:
            state.ignore_ddl = ignore_ddl
        self._caller_seed[self.address(schema, table)] = copy.deepcopy(state)
        return state

    def apply_create_table(
        self, schema: str, table: str, table_def: dict | None
    ) -> None:
        """Learn primary keys / column types from a create-table control event.

        ``table-def`` carries ``primary-key`` (reference ``aws_dms.py:141``);
        a ``column-types`` map ({column: "map"|"object"}) extends that so the
        control plane can drive JSON re-parse (D8) end-to-end — the reference
        keeps those annotations in a caller-side ColumnTypeMapStore only.
        """
        state = self.get(schema, table)
        if state.ignore_ddl:
            return
        for pk in (table_def or {}).get("primary-key", []):
            if pk not in state.primary_keys:
                state.primary_keys.append(pk)
        for col, ctype in ((table_def or {}).get("column-types") or {}).items():
            if ctype in ("map", "object"):
                state.column_types[col] = ctype
        state.exists = True

    def apply_drop_table(self, schema: str, table: str) -> None:
        """Reset cached schema to the caller-seeded state (drop semantics)."""
        state = self.get(schema, table)
        if state.ignore_ddl:
            return
        addr = self.address(schema, table)
        seeded = self._caller_seed.get(addr)
        self._tables[addr] = copy.deepcopy(seeded) if seeded else TableState()
        self._tables[addr].exists = False

    def note_columns(self, schema: str, table: str, columns: list[str]) -> list[str]:
        """Record newly observed columns; returns the ones not seen before.

        Drives additive schema evolution (the north rule's ``lang`` case):
        the sink is ALTERed / merged with the widened schema before the
        batch is applied.
        """
        state = self.get(schema, table)
        known = set(state.extra_columns)
        fresh = [c for c in columns if c not in known]
        state.extra_columns.extend(fresh)
        return fresh

    # -- persistence (checkpoint-consistent) ---------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                addr: {
                    "primary_keys": s.primary_keys,
                    "column_types": s.column_types,
                    "ignore_ddl": s.ignore_ddl,
                    "exists": s.exists,
                    "extra_columns": s.extra_columns,
                }
                for addr, s in self._tables.items()
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, payload: str) -> "SchemaRegistry":
        data = json.loads(payload) if payload else {}
        reg = cls()
        reg._tables = {addr: TableState(**state) for addr, state in data.items()}
        reg._caller_seed = copy.deepcopy(reg._tables)
        return reg

    def save(self, checkpoint_dir: str, batch_id: int) -> None:
        """Atomically persist beside the streaming checkpoint."""
        os.makedirs(checkpoint_dir, exist_ok=True)
        path = os.path.join(checkpoint_dir, "schema_registry.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id, "registry": json.loads(self.to_json())},
                      fh, sort_keys=True)
        os.replace(tmp, path)

    @classmethod
    def load(cls, checkpoint_dir: str) -> "SchemaRegistry | None":
        path = os.path.join(checkpoint_dir, "schema_registry.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            payload = json.load(fh)
        return cls.from_json(json.dumps(payload["registry"]))
