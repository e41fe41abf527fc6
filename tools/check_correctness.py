"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given sf dir and
compares against ``oracle_sql()`` via DuckDB: row count + column names +
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.4f}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def rows_to_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            pdf = df.toPandas()
            spark_cols = list(pdf.columns)
            spark_rows = [tuple(r) for r in pdf.itertuples(index=False)]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            status = "ROWS-ONLY"
            print(f"  ok {name}: {status} rows={len(spark_rows)}")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            ok = False
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        elif len(spark_rows) != len(duck_rows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        else:
            a = rows_to_canon(spark_cols, spark_rows)
            b = rows_to_canon(duck_cols, duck_rows)
            if a != b:
                ok = False
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for x, y in diffs:
                    print(f"   spark={x}\n   duck ={y}")
        if ok:
            print(f"  ok {name}: rows={len(spark_rows)}")
        else:
            failures.append(name)

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
