#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + collect-to-count). A warmup
query runs first so JVM/codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_backend_spark.registry import all_queries
from hive_backend_spark.session import get_spark

HEADLINE = [
    "q01_priority_dequeue",
    "q11_group_count",
    "q12_health_snapshot",
    "q13_fk_enrich_join",
    "q14_latest_wins",
    "q15_avg_latency_per_key",
    "q40_pricing_summary",
    "q41_shipping_priority",
    "q42_local_supplier_volume",
    "q44_order_priority_check",
    "q52_two_phase_mark",
    "q60_text_stats",
    "q62_quality_score",
    "q64_exact_dup_groups",
    "q70_cosine_topk",
    "q71_near_dup_pairs",
    "q73_centroid_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("hive-backend-spark-bench")
    specs = all_queries()

    # Warmup: touch the session + parquet footers once.
    specs["q01_priority_dequeue"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
