"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [--strict] [sf_dir] [query ...]

--strict compares float values by full repr (no 6-decimal rounding),
matching the driver's raw value-hash gate: a query that passes tolerant
but fails strict is exactly the q50-round-3 failure mode (last-ulp
serialization drift between engines).
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols, strict=False):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                elif strict:
                    v = repr(v)
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    argv = sys.argv[1:]
    strict = "--strict" in argv
    argv = [a for a in argv if a != "--strict"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
        a = normalize(srows, scols, strict=strict)
        b = normalize(drows, dcols, strict=strict)
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
