"""Local replica of the driver's Spark-vs-DuckDB oracle comparison.

Runs every ``SQL_QUERIES`` entry at the given sf dir, sorts columns by name
and rows by all columns, and compares values exactly. Exit code 1 on any
mismatch. Usage: python tools/verify_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from mas_scada_bulkingest_spark.cdc_queries import CDC_QUERIES  # noqa: E402
from mas_scada_bulkingest_spark.queries import SQL_QUERIES  # noqa: E402
from mas_scada_bulkingest_spark.streaming.driver import build_session  # noqa: E402

ALL_QUERIES = {**SQL_QUERIES, **CDC_QUERIES}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in ALL_QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        s, d = normalize(sdf), normalize(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            failures.append(name)
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rowcount {len(s)} vs {len(d)}")
            failures.append(name)
            continue
        mismatch = None
        for c in s.columns:
            a, b = s[c], d[c]
            # dtype-strict: the driver's value hash distinguishes 4500 from
            # 4500.0, so an int column on one side and float on the other is
            # a FAIL here too (no silent float coercion).
            if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
                mismatch = f"col {c}: dtype kind {a.dtype} vs {b.dtype}"
                break
            try:
                if pd.api.types.is_float_dtype(a):
                    eq = (a.fillna(-1e308) == b.fillna(-1e308)).all()
                else:
                    eq = a.equals(b) or (a.astype(str) == b.astype(str)).all()
            except Exception:
                eq = False
            if not eq:
                bad = (a.astype(str) != b.astype(str))
                i = bad[bad].index[0] if bad.any() else 0
                mismatch = f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(s)} rows x {len(s.columns)} cols")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
