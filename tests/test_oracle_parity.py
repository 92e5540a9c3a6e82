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


# DuckDB widens integer sum() to HUGEINT (and exposes unsigned types Spark
# lacks). The local fetchall() comparator coerces these to Python ints — so
# values match locally — but the driver's hash renders a HUGEINT column
# differently from Spark's BIGINT (pandas: float64 vs int64), failing the
# query even when every value is equal (round-2 q103 postmortem). Forbid the
# types outright so the drift can't reappear.
_ENGINE_TYPED = {"HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


@pytest.mark.parametrize("name", [n for n, s in SPECS if s.oracle is not None])
def test_oracle_output_types_are_spark_representable(name, oracle):
    spec = all_queries()[name]
    rel = oracle.sql(spec.oracle)
    offenders = {
        c: str(t) for c, t in zip(rel.columns, rel.types) if str(t) in _ENGINE_TYPED
    }
    assert not offenders, (
        f"{name}: oracle output columns {offenders} use DuckDB-only integer "
        "types; CAST(... AS BIGINT) in the oracle SQL"
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10


def test_rounded_value_margins_clear_of_boundaries(spark, sf_dir):
    """Float-rounding convergence audit: the determinism rule rounds float
    aggregates in BOTH engines before comparison, which is only safe while
    no compared value sits so close to a rounding decision boundary that a
    last-ulp difference between the engines' float paths could round it
    differently. This sweep re-builds EVERY registry query with F.round
    monkeypatched to a guarded form — round(x, n) additionally checks that
    nudging x*10^n by a few ulps (2^-50 relative, ~4 ulps) does not change
    the rounded result, and emits a NaN sentinel where it would — then
    collects each query's float columns and fails on any sentinel, naming
    the query and column. Queries are rebuilt from scratch (shared
    signature/centroid caches cleared) so cached pre-patch plans can't
    dodge the audit. The exempt set below is the on-boundary-by-
    construction class whose real guarantee is engine bit-equality — made
    checkable by q314_rounding_margin_audit, which emits the measured
    margins as compared columns."""
    import pyspark.sql.functions as PF

    import hive_backend_spark.queries.dedup as QD

    orig_round = PF.round
    # integer-valued sentinel: survives the .cast("bigint")/.cast("int")
    # some queries apply to rounded values (NaN would CAST_OVERFLOW there)
    SENTINEL = 2111222333.0

    def guarded_round(col, scale=0):
        c = PF.col(col) if isinstance(col, str) else col
        y = c.cast("double") * PF.lit(float(10**scale))
        u = PF.greatest(PF.abs(y), PF.lit(1.0)) * PF.lit(2.0**-50)
        stable = orig_round(y + u, 0) == orig_round(y - u, 0)
        # EXACTLY on the boundary is safe: a small-integer ratio lands on
        # .5 bit-identically in both engines (one correctly-rounded IEEE
        # division of the same integers) and both round HALF_UP. The risk
        # class is NEAR-but-not-exact — an accumulated float whose last
        # ulps differ between engines could cross the boundary.
        exact_half = (y - PF.floor(y)) == PF.lit(0.5)
        return PF.when(
            c.isNull() | stable | exact_half, orig_round(c, scale)
        ).otherwise(PF.lit(SENTINEL))

    # Compared values whose TRUE value sits ON the rounding boundary by
    # construction — safe because both engines compute the bit-identical
    # pre-round double, a premise q314_rounding_margin_audit re-checks
    # every round by emitting the measured margins themselves:
    #  - decimal-grid sums: 4-decimal money rounded at 2 decimals
    #  - rational score grids: the q62 closed form rounded at 4 decimals
    #    (identical expression in both engines)
    # q297's entry is a mechanism limit, not a finding: its (exempt-class)
    # inner round feeds exact integer arithmetic, which the sentinel value
    # overflows — the underlying grid is the q62 class audited by q314.
    exempt = {
        "q41_shipping_priority": {"revenue"},
        "q48_returned_item_revenue": {"revenue"},
        "q62_quality_score": {"quality_score"},
        "q144_curriculum_stages": {"max_score"},
        "q285_brier_decomposition": {"brier_score", "reliability"},
        "q297_simpsons_reversal": {"__sweep_error__"},
    }

    QD.clear_bands_cache()
    PF.round = guarded_round
    try:
        failures: dict[str, list[str]] = {}
        for name, spec in SPECS:
            try:
                df = spec.fn(spark, sf_dir)
                num_cols = [
                    f.name
                    for f in df.schema.fields
                    if f.dataType.simpleString()
                    in ("double", "float", "bigint", "int")
                ]
                hit = set()
                for row in df.collect():
                    for c in num_cols:
                        v = row[c]
                        if v is not None and float(v) == SENTINEL:
                            hit.add(c)
                hit -= exempt.get(name, set())
                if hit:
                    failures[name] = sorted(hit)
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                if "__sweep_error__" in exempt.get(name, set()):
                    continue
                failures[name] = [f"sweep error: {exc}"[:200]]
    finally:
        PF.round = orig_round
        QD.clear_bands_cache()
    assert not failures, (
        "rounded value within ~4 ulps of a rounding boundary (engines may "
        f"disagree): {failures}"
    )


def test_sql_surface_matches_dataframe_api(spark, sf_dir):
    """The engine is usable as a pure SQL surface: for queries whose oracle
    text is engine-portable ANSI, spark.sql(<same text>) over the registered
    views returns exactly what the DataFrame implementation returns."""
    from hive_backend_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    portable = [
        "q40_pricing_summary",
        "q41_shipping_priority",
        "q44_order_priority_check",
        "q48_returned_item_revenue",
        "q49_large_volume_customers",
    ]
    for name in portable:
        spec = all_queries()[name]
        df_api = spec.fn(spark, sf_dir)
        sql_api = spark.sql(spec.oracle)
        assert sorted(df_api.columns) == sorted(sql_api.columns), name
        a = sorted(map(repr, df_api.collect()))
        b = sorted(map(repr, sql_api.select(*df_api.columns).collect()))
        assert a == b, name
