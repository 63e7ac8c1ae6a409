#!/usr/bin/env python
"""Interleaved A/B timing — host-noise adjudication for bench deltas.

The sf0.1 bench totals swing with shared-host load, so a single-shot
per-round delta can't distinguish a plan regression from noise. This runs
the named queries INTERLEAVED (q1, q2, q1, q2, ...) so both sample the same
host conditions, and reports per-query median/min/max over the repetitions:
if the cross-round delta sits inside the interleaved spread, it's noise.

Usage: python tools/ab_bench.py [query ...]   (default: the two queries
flagged +6%/+11% r1->r2; AB_REPS env sets repetitions, default 5)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or ["kfold_target_encoding", "simhash_near_dup"]
    reps = int(os.environ.get("AB_REPS", "5"))
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # same warm-up as bench.py: measure plans, not first-touch I/O
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, t, SF_DIR).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            samples[name].append(round(time.perf_counter() - t0, 3))

    out = {
        name: {
            "median": round(statistics.median(ts), 3),
            "min": min(ts),
            "max": max(ts),
            "samples": ts,
        }
        for name, ts in samples.items()
    }
    print(json.dumps({"sf_dir": SF_DIR, "reps": reps, "queries": out}))


if __name__ == "__main__":
    main()
