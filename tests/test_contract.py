"""Driver-contract parity: every oracle-backed ``__spark_entry__`` query must
produce identical (row count, columns, values-to-6dp) results to its DuckDB
twin at sf0.001 — a fast in-suite mirror of the driver's CORRECTNESS gate.

A representative subset runs here to keep the suite quick; the full set runs
via ``python scripts/check_contract.py`` at sf0.01.
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

SUBSET = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "top_customer_per_nation",
    "nation_set_ops",
    "events_daily",
    "events_windowed",
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality_topk",
    "doc_tfidf_top3",
    "doc_sample_stats",
    "jaccard_pairs_exact",
    "training_set_selection",
    "orders_rollup",
    "events_cube",
    "events_followup_counts",
    "events_asof_prev",
    "user_sessions",
    "similarity_topk",
    "graph_degree_topk",
    "graph_triangle_count",
    "graph_components",
    "graph_pagerank5",
    "graph_ppr5",
    "graph_neighbor_features",
    "graph_neighbor_features_2hop",
    "graph_random_walks",
    "graph_labelprop3",
    "graph_betweenness",
    "graph_bfs_dist",
    "graph_sssp",
    "graph_harmonic",
    "graph_eccentricity",
    "dedup_kept_count",
    # this session's additions
    "graph_coreness3",
    "graph_matching3",
    "graph_wl3",
    "graph_salsa3",
    "graph_profile_summary",
    "graph_motif_open2path",
    "graph_boruvka2",
    "graph_rank_correlation",
    "training_mix_by_lang",
    "doc_pack_sequences",
    "doc_encoded_sample",
    "events_funnel",
]


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
