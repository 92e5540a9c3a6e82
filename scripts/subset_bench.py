#!/usr/bin/env python3
"""Minimal subset timing runner for the r12 worktree (no cold resets —
codec queries only)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_backend_spark.registry import all_queries
from hive_backend_spark.session import get_spark


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("subset-bench")
    sc = spark.sparkContext
    specs = all_queries()
    specs["q01_priority_dequeue"].fn(spark, sf_dir).count()
    par = sc.defaultParallelism
    spark.range(0, par * 10, 1, par).mapInPandas(lambda it: it, "id long").count()
    for name in names:
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        print(
            json.dumps({"query": name, "best_s": round(min(samples), 4),
                        "samples": [round(s, 3) for s in samples]}),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
