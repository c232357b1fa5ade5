"""Local stand-in for the driver's correctness gate: run every
queries() entry at sf0.01 on Spark AND its oracle_sql() on DuckDB,
compare row count + order-insensitive value hash (columns sorted by
name, rows sorted, values stringified with float rounding).

Usage: python scripts_spark/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from post_processor_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            # Fetch through pandas like the driver does: DuckDB HUGEINT
            # becomes float64 there, so integer-typed oracle SQL must cast
            # to BIGINT or the hashes diverge (11757.0 vs 11757).
            cur = con.execute(oracles[name])
            odf = cur.df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:200]}")
            n_fail += 1
            continue
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok = len(srows) == len(orows) and sorted(scols) == sorted(ocols) and sh == oh
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status}  {name}: spark {len(srows)} rows / duck {len(orows)} rows, "
              f"hash {sh} vs {oh}, cols {sorted(scols)==sorted(ocols)} ({time.time()-t0:.1f}s)")
        if not ok and len(srows) <= 8 and len(orows) <= 8:
            print("   spark:", [tuple(r) for r in srows][:8])
            print("   duck :", orows[:8])
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
