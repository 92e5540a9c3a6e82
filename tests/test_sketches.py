"""Tight sketch-accuracy audits that live OUTSIDE the hash-compared oracle
surface (VERDICT r7 / ADVICE r7: a TRUE-pinned flag in the oracle output
fails with no diagnostic of which pair missed — assert the bound here with
a readable message instead).

The registered q241 keeps a WIDE (~5-sigma, 15%-of-union) flag so the
hash-compared surface is stable at any scale factor; this file asserts the
tight bound and prints the offending pair/values on failure.
"""

from __future__ import annotations

from hive_backend_spark.queries.relational import q241_measured_errors


def test_q241_bound(spark, sf_dir):
    """Every event-type pair's HLL inclusion-exclusion estimate lands within
    5% of the pair's union size (~1.8 sigma for lgK=12; loose enough to be
    stable at the test SF, tight enough to catch a broken sketch path)."""
    rows = q241_measured_errors(spark, sf_dir).collect()
    assert rows, "q241 pair frame is empty — expected |types| choose 2 pairs"
    bad = [r for r in rows if r["err_frac"] > 0.05]
    assert not bad, "HLL inclusion-exclusion error exceeded 5% of union for: " + (
        "; ".join(
            f"({r['type_a']},{r['type_b']}) est={r['est_inter']} "
            f"exact={r['exact_inter']} err={r['err_frac']:.2%}"
            for r in bad
        )
    )


def test_q307_cube_bound(spark, sf_dir):
    """Every merged rollup level of the HLL cube lands within 5% of the
    exact distinct count (~3 sigma at lgK=12) — merging per-(type, day)
    sketches must estimate exactly as well as sketching each level
    directly."""
    from hive_backend_spark.queries.relational import q307_measured_errors

    rows = q307_measured_errors(spark, sf_dir).collect()
    assert rows, "q307 level frame is empty — expected |types|+|days|+1 rows"
    bad = [r for r in rows if r["err_frac"] > 0.05]
    assert not bad, "merged HLL cube error exceeded 5% of exact for: " + (
        "; ".join(
            f"{r['level']}={r['key']} est={r['est']:.1f} "
            f"exact={r['exact_users']} err={r['err_frac']:.2%}"
            for r in bad
        )
    )
