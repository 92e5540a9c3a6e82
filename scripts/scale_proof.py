#!/usr/bin/env python3
"""Empirical scale-proof (round-9 verdict task #1): time the most expensive
headline queries at sf0.1 AND sf1.0 (10x rows, built by make_scaledata.py)
in ONE session with the bench.py methodology (noop-format write so every
output column executes; min-of-N; q82/q79 cold via cache clears), and
report each query's scaling exponent

    a = log(t_sf1 / t_sf0.1) / log(10)      (t ~ N^a)

a <= ~1 is linear (perfect for scan/agg pipelines), a in (1, 1.3] is
acceptable shuffle/log-factor growth, a > 1.3 is the super-linear class no
plan inspection can catch (candidate-pair volume growing faster than the
corpus, quadratic cells, driver-side state) and gets a named cause or a fix
in COVERAGE.md.

Output: ONE JSON line {"metric": "scale_proof", "sf_ratio": 10, "queries":
{name: {"t_sf01": s, "t_sf1": s, "exponent": a}}, ...} — committed as
BENCH_sf1_r10.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_backend_spark.registry import all_queries
from hive_backend_spark.session import get_spark

SF01 = os.environ.get("SCALE_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SCALE_SF1", "/root/repo/.scaledata/sf1")

# The 20 most expensive BENCH_full_r09 queries (the plan-pin set) plus the
# cold signature pass itself — the queries where super-linear growth would
# hurt first.
QUERIES = [
    "q82_minhash_bands",
    "q79_dup_clusters",
    "q227_kcore_decomposition",
    "q222_prefix_filter_join",
    "q309_degree_assortativity",
    "q190_bloom_fpr_audit",
    "q171_decontamination_ladder",
    "q130_triangle_census",
    "q123_pagerank_centrality",
    "q220_multiprobe_lsh",
    "q287_clustering_coefficients",
    "q295_audio_decimate_stats",
    "q184_bloom_decontamination",
    "q304_peak_concurrency",
    "q267_fellegi_sunter_scores",
    "q124_training_pipeline",
    "q100_simhash_near_dup",
    "q272_resize_pipeline_stats",
    "q328_jpeg_decode_stats",
    "q212_chunk_dedup_census",
    "q179_containment_pairs",
]


def main() -> None:
    try:
        load1m, load5m, _ = os.getloadavg()
    except OSError:
        load1m = load5m = None
    spark = get_spark("hive-backend-spark-scale-proof")
    specs = all_queries()

    # warm up JVM codegen + python worker pool (bench.py discipline)
    specs["q01_priority_dequeue"].fn(spark, SF01).count()
    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 10, 1, par).mapInPandas(lambda it: it, "id long").count()

    from hive_backend_spark.queries.dedup import clear_bands_cache, clear_labels_cache

    COLD_RESET = {
        "q82_minhash_bands": clear_bands_cache,
        "q79_dup_clusters": clear_labels_cache,
    }

    def run(name: str, sf_dir: str, attempts: int) -> float:
        reset = COLD_RESET.get(name)
        best = float("inf")
        for _ in range(attempts):
            if reset is not None:
                reset()
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    out: dict = {}
    for name in QUERIES:
        # sf0.1 first (small), 3 attempts; sf1 second, 2 attempts (each
        # attempt is 10x the work — min-of-2 still absorbs first-run JIT)
        t01 = run(name, SF01, 3)
        t1 = run(name, SF1, 2)
        a = math.log(t1 / t01) / math.log(10.0)
        out[name] = {
            "t_sf01": round(t01, 4),
            "t_sf1": round(t1, 4),
            "exponent": round(a, 3),
        }
        print(
            f"# {name}: sf0.1 {t01:.2f}s  sf1 {t1:.2f}s  exponent {a:.3f}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "scale_proof",
                "sf_ratio": 10,
                "sf01_dir": SF01,
                "sf1_dir": SF1,
                "unit": "sec",
                "queries": out,
                "load_avg_1m_at_start": load1m,
                "load_avg_5m_at_start": load5m,
                "method": "noop-write; sf0.1 min-of-3, sf1 min-of-2; "
                "q82/q79 cold via cache clears before every attempt",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
