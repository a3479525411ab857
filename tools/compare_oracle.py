"""Replicates the driver's correctness gate locally: runs each
queries() entry through Spark and its oracle_sql() through DuckDB on
the same sf_dir, compares row count, column names, and values
(columns sorted by name, rows sorted, floats compared exactly after
the 6-dp rounding both sides already apply).

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float, bool)):
                v = float(v)  # Decimal
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def compare(spark, con, name, qfn, sql, sf_dir):
    t0 = time.time()
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    t_duck = time.time() - t0
    sc, sr = normalize(srows, scols)
    dc, dr = normalize(drows, dcols)
    status = "OK"
    detail = ""
    if sc != dc:
        status = "SCHEMA_MISMATCH"
        detail = f"spark={sc} duck={dc}"
    elif len(sr) != len(dr):
        status = "ROWCOUNT_MISMATCH"
        detail = f"spark={len(sr)} duck={len(dr)}"
    elif sr != dr:
        status = "VALUE_MISMATCH"
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        detail = f"first diffs: {diffs}"
    print(f"{name:28s} {status:18s} rows={len(sr):7d} spark={t_spark:6.1f}s duck={t_duck:6.1f}s {detail}")
    return status == "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from pgd_spark.session import get_spark

    spark = get_spark(app_name="oracle_compare", master="local[8]", shuffle_partitions=8)
    con = duck_connect(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = bad = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name:28s} NO_ORACLE (rows-only check)")
            skipped += 1
            continue
        try:
            if compare(spark, con, name, fn, oracles[name], sf_dir):
                ok += 1
            else:
                bad += 1
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:400]}")
            bad += 1
    print(f"\n{ok} ok, {bad} bad, {skipped} rows-only")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
