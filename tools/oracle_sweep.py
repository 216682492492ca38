"""Driver-mimicking correctness sweep: run every ``queries()`` entry on
Spark and, when an ``oracle_sql()`` entry exists, the same query on DuckDB
over the identical parquet tables; compare row count, column names, and a
canonicalized value hash (columns sorted by name, rows sorted, floats
rounded to 6 decimals) — the same contract the round driver applies.

Usage::

    python tools/oracle_sweep.py [sf_dir] [only_query ...]

Exit code 1 if any entry mismatches or errors.
"""
from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def non_scalar_columns(schema) -> list[str]:
    """Top-level array/map/struct columns — the cell types the round
    driver's pandas sort/hash canonicalization chokes on (it factorizes
    cells; lists are unhashable). Catalog entries must not emit them."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def canonical_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
            df[c] = df[c] + 0.0  # collapse -0.0 to +0.0
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)), key=repr)
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from mlx_vector_db_spark.session import get_spark

    spark = get_spark("oracle-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            bad_cols = non_scalar_columns(sdf.schema)
            if bad_cols:
                # catalog contract (r13, VERDICT r12 #1): the driver's
                # pandas canonicalizer cannot hash array/map/struct
                # cells — every entry must emit scalar columns only
                print(
                    f"FAIL {name}: non-scalar output columns {bad_cols} "
                    "(catalog contract: driver-hashable scalars only)"
                )
                bad.append(name)
                continue
            got = sdf.toPandas()
        except Exception:
            print(f"ERR  {name}: spark raised")
            traceback.print_exc()
            bad.append(name)
            continue
        if name not in oracles:
            print(f"rows {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception:
            print(f"ERR  {name}: duckdb raised")
            traceback.print_exc()
            bad.append(name)
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            try:
                if canonical_hash(got) != canonical_hash(want):
                    problems.append("value hash mismatch")
            except Exception as exc:  # unhashable cell type = driver err
                problems.append(f"canonicalizer: {exc!r}")
        status = "PASS" if not problems else "FAIL"
        print(f"{status} {name}: {len(got)} rows [{time.time()-t0:.1f}s]"
              + ("" if not problems else "  " + "; ".join(problems)))
        if problems:
            bad.append(name)
    print(f"\n{len(bad)} failing: {bad}" if bad else "\nall green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
