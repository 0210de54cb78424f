"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin on DuckDB over the same parquet, then compares row count, column names,
and an order-insensitive value multiset.

Usage: python scripts/verify_oracle.py [query_name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entry
from liblevenshtein_rust_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("verify_oracle", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        from liblevenshtein_rust_spark.session import release_pooled

        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        release_pooled()
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(srows)} cols={scols}")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = canon([tuple(r) for r in srows], scols) == canon(orows, ocols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} spark_rows={len(srows)} oracle_rows={len(orows)}"
            f" cols_match={ok_cols} vals_match={ok_vals}"
        )
        if status == "FAIL" and ok_cols:
            a = canon([tuple(r) for r in srows], scols)
            b = canon(orows, ocols)
            sa, sb = set(a), set(b)
            print("  spark-only:", list(sa - sb)[:5])
            print("  oracle-only:", list(sb - sa)[:5])
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
