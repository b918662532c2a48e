"""Self-check of the driver contract: run queries() vs oracle_sql() via DuckDB.

Mimics the driver's comparison (row count + schema + order-insensitive
value hash with columns sorted by name) so mismatches surface before the
round's CORRECTNESS_r{N}.json does.

Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(json.dumps(vals, default=str, sort_keys=True))
    return sorted(out)


def driver_canon_ok(rows, columns) -> str | None:
    """Mimic the driver's pandas canonicalization (sort_values over all
    columns).  Array/map cells are unhashable there and crash the round's
    CORRECTNESS entry even when values match — catch that locally."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=list(columns))
        if len(pdf):
            pdf.sort_values(by=list(columns))
        return None
    except Exception as exc:  # noqa: BLE001
        return f"{type(exc).__name__}: {exc}"


def main(sf_dir: str) -> int:
    import __spark_entry__ as entrymod
    from commons_codec_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sorted(sdf.columns)
        status = []
        if name in oracles:
            odf = con.execute(oracles[name]).fetch_arrow_table()
            orows = [
                {k: (v.as_py() if hasattr(v, "as_py") else v) for k, v in zip(odf.column_names, row)}
                for row in zip(*[odf.column(c).to_pylist() for c in odf.column_names])
            ]
            orows = [dict(zip(odf.column_names, vals)) for vals in zip(*[odf.column(c).to_pylist() for c in odf.column_names])] if odf.num_rows else []
            ocols = sorted(odf.column_names)
            ok_rows = len(srows) == len(orows)
            ok_cols = scols == ocols
            ok_vals = normalize(srows, scols) == normalize(orows, ocols) if ok_cols else False
            ok = ok_rows and ok_cols and ok_vals
            status = [
                f"rows {len(srows)}=={len(orows)}:{ok_rows}",
                f"cols:{ok_cols}",
                f"vals:{ok_vals}",
            ]
        else:
            ok = len(srows) >= 0
            status = [f"rows-only: {len(srows)}"]
        canon_err = driver_canon_ok(srows, scols)
        if canon_err:
            ok = False
            status.append(f"driver-canon: {canon_err}")
        print(f"{'PASS' if ok else 'FAIL'} {name}: {' '.join(status)}")
        if not ok:
            failures += 1
            if name in oracles and scols == sorted(ocols):
                a, b = normalize(srows, scols), normalize(orows, ocols)
                only_s = [x for x in a if x not in set(b)][:3]
                only_o = [x for x in b if x not in set(a)][:3]
                print("  spark-only:", only_s)
                print("  oracle-only:", only_o)
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(main(sf))
