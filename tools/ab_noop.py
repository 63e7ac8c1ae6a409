#!/usr/bin/env python
"""A/B timing for the r12 noop-wall work: per named query, REPS count()
drains AND REPS noop-sink drains in one warm JVM, plus the host canary, so
a before/after pair taken in the same window compares both protocols.

Usage: python tools/ab_noop.py q1 [q2 ...]   (AB_REPS env, default 3)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: ab_noop.py q1 [q2 ...]", file=sys.stderr)
        sys.exit(2)
    reps = int(os.environ.get("AB_REPS", "3"))
    import bench

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    spark = get_spark("ab-noop")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    bench._warm(spark)

    out: dict = {"canary_start": bench._host_canary()}
    for name in names:
        fn = qs[name]
        counts, noops = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            counts.append(round(time.perf_counter() - t0, 3))
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noops.append(round(time.perf_counter() - t0, 3))
        out[name] = {"count": counts, "noop": noops,
                     "count_min": min(counts), "noop_min": min(noops)}
    out["canary_end"] = bench._host_canary()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
