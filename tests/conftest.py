"""Shared pytest fixtures: one SparkSession, a DuckDB oracle connection, and
the same compare logic the driver uses (row count + schema-sorted,
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_backend_spark.catalog import TABLES, table_path
from hive_backend_spark.session import get_spark

# Default to sf0.01 — the DRIVER's correctness scale — so scale-dependent
# divergence (e.g. DuckDB integer-sum → HUGEINT type drift) can't pass
# locally and fail in CORRECTNESS_r{N}. Set SPARK_GRAFT_TEST_SF_DIR to
# sf0.001 for a faster smoke loop while iterating.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("hive-backend-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / +0.0 and format at full precision
        return repr(v + 0.0)
    if isinstance(v, bool):
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows — the driver's
    order-insensitive comparison shape."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(map(repr, t)))


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"{name}: first differing row #{i}:\n  spark : {a}\n  duckdb: {b}"
