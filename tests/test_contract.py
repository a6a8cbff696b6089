"""Driver-contract parity: every oracle-backed ``__spark_entry__`` query must
produce identical (row count, columns, values-to-6dp) results to its DuckDB
twin at sf0.001 — a fast in-suite mirror of the driver's CORRECTNESS gate.

EVERY registry query runs here (the driver's per-round gate samples ~50 of
them with a different sample each round; this file is what certifies the
unsampled rest, so ``python -m pytest -x -q`` alone covers all of them).
The heavier sf0.01 sweep stays available via
``python scripts/check_contract.py``.
"""
from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

import __spark_entry__ as _entry

SUBSET = sorted(_entry.queries().keys())


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    return str(v)


def _canon(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False)
    )


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, ddb, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = ddb.execute(entrymod.oracle_sql()[name]).df()
    assert len(sdf) == len(odf), f"rowcount spark={len(sdf)} duckdb={len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    a, b = _canon(sdf), _canon(odf)
    assert a == b, f"value mismatch, first diff: {next((x, y) for x, y in zip(a, b) if x != y)}"


def test_every_oracle_key_has_a_query():
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only queries are intentional, documented exceptions
    rows_only = set(qs) - set(oracles)
    # every query has a full DuckDB twin — the LSH pipelines via their
    # portable md5/quantized families, the multimodal pipeline via its
    # column-expression payload generator
    assert rows_only == set()
