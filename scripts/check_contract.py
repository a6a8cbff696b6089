"""Local mimic of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()`` twin on
DuckDB at sf0.01, compare row count, column names, and order-insensitive
values (floats normalized to 6 decimals). Usage:

    python scripts/check_contract.py [query ...]
"""
from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    import __spark_entry__ as entrymod
    from parallel_betweenness_centrality_using_bsp_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows-only  {name}: {len(sdf)} rows  cols={list(sdf.columns)}  {wall:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
        if not problems:
            a, b = canon(sdf), canon(odf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(sdf)} rows  {wall:.1f}s")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
