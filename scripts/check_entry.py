#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() in DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.  Usage:

    python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df):
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if not np.issubdtype(df[c].dtype, np.number):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            if not all(
                (math.isnan(x) and math.isnan(y)) or abs(x - y) < 1e-9
                for x, y in zip(av.astype(float), bv.astype(float))
            ):
                return False
        elif not av.equals(bv):
            return False
    return True


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from probe_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_entry", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    osql = entry.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {e!r:.300}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows ({el:.1f}s, no SQL oracle)")
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {e!r:.300}")
            failures.append(name)
            continue
        sa, da = norm(sdf), norm(ddf)
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            failures.append(name)
        elif len(sa) != len(da):
            print(f"FAIL  {name}: rows {len(sa)} vs {len(da)}")
            failures.append(name)
        elif not values_equal(sa, da):
            print(f"FAIL  {name}: value mismatch")
            mism = (sa != da).any(axis=1)
            print(sa[mism].head(3).to_string())
            print(da[mism].head(3).to_string())
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sa)} rows ({el:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
