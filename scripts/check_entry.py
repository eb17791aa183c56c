"""Self-check mimicking the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 against its
oracle_sql() via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (cells stringified, rows sorted).
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry
from crawler_distributed_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = sys.argv[1:] or list(qs)
    failures = 0
    for name in only:
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"{name}: SPARK ERROR {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows) OK" if srows else f"{name}: rows-only EMPTY (warn)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {str(e)[:300]}")
            failures += 1
            continue
        sc, sv = frame_key(scols, [tuple(r) for r in srows])
        dc, dv = frame_key(dcols, drows)
        if sc != dc:
            print(f"{name}: COLS MISMATCH spark={sc} duck={dc}")
            failures += 1
            continue
        if len(sv) != len(dv):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(sv)} duck={len(dv)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(sv, dv) if a != b]
        if bad:
            print(f"{name}: VALUE MISMATCH ({len(bad)}/{len(sv)} rows); first: spark={bad[0][0]} duck={bad[0][1]}")
            failures += 1
        else:
            print(f"{name}: OK ({len(sv)} rows, {len(sc)} cols)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
