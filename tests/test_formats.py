"""Round-trip tests for the multi-format table IO router."""

import pytest

from parallel_betweenness_centrality_using_bsp_spark.sources.formats import read_table, write_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip_matches_parquet(spark, tmp_path, fmt):
    """nation written to each format and read back equals the parquet
    original, value for value (explicit DDL schema for the text formats)."""
    src = read_table(spark, f"{SF_DIR}/nation.parquet")
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    path = str(tmp_path / f"nation.{fmt}")
    write_table(src.select(*cols), path, fmt=fmt)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    back = read_table(spark, path, fmt=fmt, schema=schema if fmt in ("csv", "json") else None)
    assert _rows(back, cols) == _rows(src, cols)
    assert dict(back.select(*cols).dtypes) == dict(src.select(*cols).dtypes)


def test_extension_detection_and_errors(spark, tmp_path):
    src = read_table(spark, f"{SF_DIR}/region.parquet")
    p = str(tmp_path / "region.jsonl")
    write_table(src, p)  # detected json from .jsonl
    back = read_table(spark, p, schema="r_regionkey int, r_name string, r_comment string")
    assert back.count() == src.count()
    with pytest.raises(ValueError, match="cannot detect"):
        read_table(spark, str(tmp_path / "mystery.dat"))


def test_csv_failfast_surfaces_corrupt_rows(spark, tmp_path):
    """FAILFAST: a malformed row raises instead of silently nulling."""
    bad = tmp_path / "bad.csv"
    bad.mkdir()
    (bad / "part-0.csv").write_text("a,b\n1,2\nnot_a_number,3\n")
    df = read_table(spark, str(bad), schema="a bigint, b bigint", fmt="csv")
    with pytest.raises(Exception):
        df.collect()


def test_tsv_delimiter(spark, tmp_path):
    src = read_table(spark, f"{SF_DIR}/region.parquet").select("r_regionkey", "r_name")
    p = str(tmp_path / "region.tsv")
    write_table(src, p)
    back = read_table(spark, p, schema="r_regionkey int, r_name string")
    assert _rows(back, ["r_regionkey", "r_name"]) == _rows(src, ["r_regionkey", "r_name"])


def test_explicit_delimiter_overrides_tsv_extension(spark, tmp_path):
    """An explicitly passed delimiter wins over the '.tsv' tab default."""
    src = read_table(spark, f"{SF_DIR}/region.parquet").select("r_regionkey", "r_name")
    p = str(tmp_path / "pipey.tsv")
    write_table(src, p, delimiter="|")
    raw = read_table(spark, p, schema="line string", delimiter="\x01", header=False)
    assert all("|" in r["line"] for r in raw.collect() if r["line"])
    back = read_table(spark, p, schema="r_regionkey int, r_name string", delimiter="|")
    assert _rows(back, ["r_regionkey", "r_name"]) == _rows(src, ["r_regionkey", "r_name"])
