#!/usr/bin/env python3
"""Correctness AT SCALE: run a sample of registered queries at sf1.0 (the
10x corpus from make_scaledata.py) through BOTH engines — the Spark
implementation and the DuckDB oracle — and value-compare with the driver's
own normalization (sorted columns, sorted rows, repr-normalized floats).

The sf0.01 oracle gate proves semantics; this proves the implementations
do not DIVERGE as data grows (cap/escalation branches that only arm on
bigger corpora, overflow classes, sampling-fraction edges). Sample: the
driver's first-12 alphabetical slice + the top-20 perf set + the round-10
media queries. Oracles that are themselves quadratic at 50k docs (naive
all-pairs forms kept deliberately naive for readability) are excluded by
name with the reason recorded in the output JSON.

Output: one JSON line {"metric": "scale_correctness", "sf_dir": ...,
"pass": N, "fail": [...], "excluded": {...}} — committed as
CORRECTNESS_sf1_r10.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

from conftest import TABLES, normalize_rows
from hive_backend_spark.registry import all_queries
from hive_backend_spark.session import get_spark

SF1 = os.environ.get("SCALE_SF1", "/root/repo/.scaledata/sf1")

# Naive quadratic oracle forms that are fine at the 500-doc driver scale
# but would grind DuckDB at 50k docs. Since round 11 every exclusion here
# is covered at sf1 by scripts/scale_invariants.py instead (independent
# pure-Python graph/hash replays + Spark-side cross-query invariants,
# recorded beside this sweep in CORRECTNESS_sf1_r11.json) — "excluded"
# means "DuckDB cannot replay it at this scale", not "unverified".
EXCLUDED = {
    "q338_rowgroup_pruning_audit": "oracle SQL hardcodes the sf0.01 "
    "catalog's parquet file paths (DuckDB parquet_metadata() on the "
    "driver's real fixture files) — running it against another sf_dir "
    "compares mismatched corpora by construction; the recorded reason "
    "the query never enters the sf1 sweep",
    "q222_prefix_filter_join": "oracle is the naive any-shared-shingle "
    "all-pairs form — sf1 coverage: scale_invariants (sampled Python "
    "Jaccard replay + q68 recall containment + structural)",
    "q179_containment_pairs": "oracle is the naive all-pairs containment "
    "form — sf1 coverage: scale_invariants (sampled Python recompute + "
    "bounds + flag rule)",
    "q220_multiprobe_lsh": "oracle replays every probe x corpus pair "
    "naively — sf1 coverage: scale_invariants (numpy brute-force truth "
    "per probe)",
    "q130_triangle_census": "oracle joins the full candidate-pair closure "
    "— sf1 coverage: scale_invariants (full Python triangle census)",
    "q287_clustering_coefficients": "oracle joins the full candidate-pair "
    "closure — sf1 coverage: scale_invariants (full Python per-node lcc)",
    "q309_degree_assortativity": "oracle joins the full candidate-pair "
    "closure — sf1 coverage: scale_invariants (full Python moment replay)",
    "q227_kcore_decomposition": "oracle peels with recursive CTE over full "
    "pair closure — sf1 coverage: scale_invariants (full Python peel, "
    "round-by-round census equality)",
    "q79_dup_clusters": "oracle computes connected components via "
    "recursive CTE — sf1 coverage: scale_invariants (full Python "
    "union-find label equality + edge/size/representative invariants)",
    "q171_decontamination_ladder": "oracle replays 4 dedup rungs naively "
    "— sf1 coverage: scale_invariants (verdict rule + row-census "
    "invariants)",
    "q82_minhash_bands": "oracle replays the 128-seed minhash in SQL — "
    "linear but with a DuckDB constant measured at ~25 min for 50k docs; "
    "sf1 coverage: scale_invariants (sampled pure-Python band "
    "re-derivation + shape + fingerprint-consistency invariants)",
    "q212_chunk_dedup_census": "oracle replays the chunk fingerprint pass "
    "in SQL — sf1 coverage: scale_invariants (arithmetic identities)",
    "q67_lsh_candidates": "oracle replays the full band table in SQL — "
    "sf1 coverage: scale_invariants (exact equivalence to the naive "
    "banded self-join rebuilt from q82's output)",
    "q123_pagerank_centrality": "oracle's unrolled pagerank over the pair "
    "closure OOMs DuckDB at 50k docs (measured r10) — sf1 coverage: "
    "scale_invariants (full Python power-iteration replay + rank-sum)",
}


def main() -> None:
    spark = get_spark("hive-backend-spark-scale-correctness")
    specs = all_queries()
    sample = sorted(specs)[:12]
    top = [
        "q82_minhash_bands", "q190_bloom_fpr_audit", "q123_pagerank_centrality",
        "q295_audio_decimate_stats", "q184_bloom_decontamination",
        "q304_peak_concurrency", "q267_fellegi_sunter_scores",
        "q124_training_pipeline", "q100_simhash_near_dup",
        "q272_resize_pipeline_stats", "q328_jpeg_decode_stats",
        "q212_chunk_dedup_census", "q329_mp4_structure_stats",
        "q330_mp3_frame_stats", "q331_progressive_jpeg_stats",
        "q40_pricing_summary", "q91_market_share", "q57_sessionize",
        "q14_latest_wins", "q67_lsh_candidates",
    ]
    names = [n for n in dict.fromkeys(sample + top) if n not in EXCLUDED]

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF1}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")

    passed, failed = [], []
    for name in names:
        spec = specs[name]
        try:
            sdf = spec.fn(spark, SF1)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(spec.oracle)
            d_cols, d_rows = rel.columns, rel.fetchall()
            ok = (
                sorted(s_cols) == sorted(d_cols)
                and len(s_rows) == len(d_rows)
                and normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows)
            )
            (passed if ok else failed).append(name)
            print(
                f"# {name}: {'OK' if ok else 'MISMATCH'} "
                f"(spark {len(s_rows)} rows, oracle {len(d_rows)})",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            failed.append(name)
            print(f"# {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_correctness",
                "sf_dir": SF1,
                "n_checked": len(names),
                "pass": len(passed),
                "fail": failed,
                "excluded": EXCLUDED,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
