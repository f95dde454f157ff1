"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, compares row count + column names + order-insensitive value hash
(columns sorted by name, rows sorted, values normalized), and prints a
pass/fail table. Usage:

    python tools/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), h


def main() -> int:
    only = set(sys.argv[1:])
    import __spark_entry__ as entrymod
    from log_agent_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sn, sh = value_hash(scols, srows)
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({sn} rows, {time.time()-t0:.1f}s)")
            if sn == 0 and name != "join_anti":
                print(f"     WARNING: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
            dn, dh = value_hash(dcols, drows)
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc()
            failures += 1
            continue
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if sn != dn:
            status.append(f"rows spark={sn} duck={dn}")
        if sh != dh:
            status.append("value-hash mismatch")
        if status:
            failures += 1
            print(f"FAIL {name}: {'; '.join(status)} ({time.time()-t0:.1f}s)")
            if sn and dn and sorted(scols) == sorted(dcols):
                # show first differing normalized rows to debug
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("|".join(_norm(r[i]) for i in order_s) for r in srows)
                ld = sorted("|".join(_norm(r[i]) for i in order_d) for r in drows)
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"     spark: {a}\n     duck : {b}")
                        break
        else:
            print(f"ok   {name}: {sn} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
