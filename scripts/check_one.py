"""Check a subset of contract queries against their DuckDB oracles.

Usage: python scripts/check_one.py <sf_dir> <query> [<query> ...]

Same comparison as check_contract.py (row count + sorted-column schema +
order-insensitive value hash) but only for the named queries — fast
iteration while adding operators.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from check_contract import TABLES, driver_canon_ok, normalize  # noqa: E402


def main(sf_dir: str, names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from commons_codec_spark.session import get_spark

    spark = get_spark(app_name="contract-one", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name in names:
        if name not in qs:
            print(f"FAIL {name}: no such query")
            failures += 1
            continue
        sdf = qs[name](spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sorted(sdf.columns)
        if name in oracles:
            odf = con.execute(oracles[name]).fetch_arrow_table()
            orows = (
                [
                    dict(zip(odf.column_names, vals))
                    for vals in zip(*[odf.column(c).to_pylist() for c in odf.column_names])
                ]
                if odf.num_rows
                else []
            )
            ocols = sorted(odf.column_names)
            ok_rows = len(srows) == len(orows)
            ok_cols = scols == ocols
            ok_vals = (
                normalize(srows, scols) == normalize(orows, ocols) if ok_cols else False
            )
            ok = ok_rows and ok_cols and ok_vals
            status = [
                f"rows {len(srows)}=={len(orows)}:{ok_rows}",
                f"cols:{ok_cols}",
                f"vals:{ok_vals}",
            ]
        else:
            ok, orows, ocols = True, None, None
            status = [f"rows-only: {len(srows)}"]
        canon_err = driver_canon_ok(srows, scols)
        if canon_err:
            ok = False
            status.append(f"driver-canon: {canon_err}")
        print(f"{'PASS' if ok else 'FAIL'} {name}: {' '.join(status)}")
        if not ok:
            failures += 1
            if orows is not None and scols == ocols:
                a, b = normalize(srows, scols), normalize(orows, ocols)
                print("  spark-only:", [x for x in a if x not in set(b)][:3])
                print("  oracle-only:", [x for x in b if x not in set(a)][:3])
            elif ocols is not None:
                print("  spark cols:", scols)
                print("  oracle cols:", ocols)
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2:]))
