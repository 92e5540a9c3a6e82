"""The core correctness gate, mirrored locally: every registered query with
an oracle must match DuckDB exactly (columns, row count, values) at the test
scale factor. This is the same comparison the driver runs at sf=0.01."""

from __future__ import annotations

import pytest

from hive_backend_spark.registry import all_queries

from .conftest import assert_matches_oracle

SPECS = sorted(all_queries().items())


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is not None])
def test_oracle_parity(name, spark, sf_dir, oracle):
    spec = all_queries()[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, oracle, spec.oracle, name=name)


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is None])
def test_rows_only_queries_run(name, spark, sf_dir):
    spec = all_queries()[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10
