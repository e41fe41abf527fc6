"""Local simulation of the driver's correctness gate — STRICT exact-value mode.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given sf dir and
compares against ``oracle_sql()`` via DuckDB.  Unlike the round-1 version
(which rounded floats to 4 dp), this compares **exact value representations**:
the driver hashes canonicalized cell values, so the only way to be safe is for
the Spark result and the DuckDB result to contain *identical* Python values
after ``toPandas()`` / ``.df()``.  Floats are compared by ``repr`` (shortest
round-trip — bit-identical doubles or bust), ints by decimal string, Decimals
by ``str`` (scale included), timestamps by ISO string.

Usage:
    python tools/check_correctness.py [sf_dir] [query_name ...]
    python tools/check_correctness.py --loose ...   # legacy 4-dp comparison
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_loose(v):
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


def canon_strict(v):
    """Exact canonical repr.  Two cells compare equal iff a driver-side hash
    of the underlying values would agree."""
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # shortest round-trip: bit-identical doubles only
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_strict(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_strict(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def rows_to_canon(cols, rows, canon):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def pdf_rows(pdf: pd.DataFrame):
    """Extract rows as python tuples, mapping pandas NA markers to None."""
    out = []
    for r in pdf.itertuples(index=False):
        row = []
        for v in r:
            if v is None or v is pd.NaT:
                row.append(None)
            elif isinstance(v, float) and math.isnan(v):
                row.append(v)  # keep NaN distinct from NULL? driver can't tell; keep NaN
            else:
                row.append(v)
        out.append(tuple(row))
    return out


def main():
    args = [a for a in sys.argv[1:]]
    loose = "--loose" in args
    if loose:
        args.remove("--loose")
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))
    canon = canon_loose if loose else canon_strict

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
            spark_rows = pdf_rows(pdf)
            # driver canonicalization sanity: every cell must be hashable/sortable
            for r in spark_rows[:5]:
                for v in r:
                    hash(canon_strict(v))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"  ok {name}: ROWS-ONLY rows={len(spark_rows)}")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
            duck_cols = list(ddf.columns)
            duck_rows = pdf_rows(ddf)
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
            a = rows_to_canon(spark_cols, spark_rows, canon)
            b = rows_to_canon(duck_cols, duck_rows, canon)
            if a != b:
                ok = False
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch ({sum(1 for x, y in zip(a, b) if x != y)} rows); first diffs:")
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
