"""Local stand-in for the driver's DuckDB-oracle verification:
runs each queries() entry on Spark and its oracle_sql() twin on DuckDB
at sf0.01, compares row count + column names + order-insensitive
stringified values.
"""

from __future__ import annotations

import os
import sys
import hashlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from osmzen_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


RISKY_TYPES: set[str] = set()


def norm_val(v):
    # STRICT: no cross-type coercion. The driver hashes raw value
    # representations; round 1 proved that a lenient normalizer here
    # (Decimal->int collapse) hides real driver-side hash mismatches.
    # Queries must emit representation-stable primitives (double /
    # bigint / string / bool) on BOTH engines. Decimal and datetime
    # outputs are flagged so they get rewritten at the source.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(v)
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        RISKY_TYPES.add("Decimal")
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        RISKY_TYPES.add(type(v).__name__)
        return str(v)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, lines


def main(names=None):
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = names or list(qs)
    failures = []
    for name in selected:
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sh, slines = table_hash(scols, [tuple(r) for r in srows])
        oh, olines = table_hash(ocols, orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_hash = sh == oh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        risky = f" RISKY_TYPES={sorted(RISKY_TYPES)}" if RISKY_TYPES else ""
        RISKY_TYPES.clear()
        print(f"[{status}] {name}: rows {len(srows)}/{len(orows)} cols={ok_cols} hash={ok_hash}{risky}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols:  {sorted(scols)}")
                print(f"    oracle cols: {sorted(ocols)}")
            if ok_cols:
                sset, oset = set(slines), set(olines)
                only_s = list(sset - oset)[:3]
                only_o = list(oset - sset)[:3]
                for l in only_s:
                    print(f"    spark-only:  {l}")
                for l in only_o:
                    print(f"    oracle-only: {l}")
    print(f"\n{len(selected) - len(failures)}/{len(selected)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
