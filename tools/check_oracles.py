"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from hoover_snoop2_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:28s} rows-only: {n} rows")
            except Exception as ex:
                failures += 1
                print(f"{name:28s} ERROR (rows-only): {ex}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [row.asDict() for row in sdf.collect()]
            ddf = con.execute(os_[name]).fetch_arrow_table()
            dcols = ddf.column_names
            drows = ddf.to_pylist()
        except Exception as ex:
            failures += 1
            print(f"{name:28s} ERROR: {type(ex).__name__}: {str(ex)[:300]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures += 1
            print(f"{name:28s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        a, b = normalize(srows, scols), normalize(drows, dcols)
        if len(a) != len(b):
            failures += 1
            print(f"{name:28s} ROWCOUNT spark={len(a)} duck={len(b)}")
            continue
        bad = [(x, y) for x, y in zip(a, b) if x != y]
        if bad:
            failures += 1
            print(f"{name:28s} VALUE MISMATCH ({len(bad)} rows) e.g. {bad[0]}")
        else:
            print(f"{name:28s} OK ({len(a)} rows)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
