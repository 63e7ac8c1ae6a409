#!/usr/bin/env python
"""100x recommender-stack scale probe (r8): extend the r6 30x hybrid row
two tiers up — ~58M interactions — and measure the two things the 30x
probe could not settle:

- ALS train wall + SHUFFLE BYTES at 100x: the bucketed layout's claim is
  that every U/I half-step join reads co-located buckets with zero
  Exchange, so total shuffle should track the OUTPUT-keyed aggregates
  (|interactions|-proportional), not the join pair space. REST status API
  deltas (same helper as tools/graph_scale_probe.py) put a number on it.
- TRUE cold-process serving at 100x: the train phase persists every model
  (ALS X/Y, item-item neighbors, decayed popularity, capped basket) in
  the fingerprint-keyed store; a FRESH python subprocess then runs
  hybrid_recommendations against the same scratch + store and must (a)
  never retrain and (b) produce an order-independent output hash equal to
  the training process's — offline-train / online-serve at probe scale.

Usage: python tools/recsys_scale_probe.py [replicas]   (default 100)
Prints one JSON line per step; SCALE.md rows are written by hand.
The serve phase is re-entered via SPARK_GRAFT_RECSYS_SERVE=1 (internal).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

os.environ.setdefault("SPARK_GRAFT_UI_ENABLED", "true")

SRC_TABLES = ("customer", "orders", "lineitem", "part")
STORE = os.environ.get("SPARK_GRAFT_RECSYS_STORE", "/tmp/spark_graft_recsys_store")


def _out_fingerprint(df):
    """Order-independent output fingerprint: sum of per-row xxhash64 over
    every column, accumulated in DECIMAL(38,0) (ANSI mode raises on BIGINT
    sum overflow; decimal is exact and commutative)."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), str(row["h"])


def serve_phase() -> None:
    """Runs in a FRESH process: serve the hybrid recommender from the
    persisted store. EVERY model-builder entry point on the hybrid path is
    monkeypatched to raise — both ALS trainers, the item-item neighbor
    build and the capped-basket build — so identity can only come from the
    store (same gate shape as tests; r8 ADVICE closed the gap where only
    the ALS trainers were patched). The one remaining builder, the decayed
    -popularity aggregate, is inlined in _recsys_artifacts' miss branch
    AFTER the patched item_item_topk call, so it is unreachable without
    tripping a _boom first."""
    import scale_probe

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.ml import als as als_mod
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import (
        registry,
        registry_relational,
    )
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    def _boom(*a, **k):  # noqa: ANN002, ANN003
        raise AssertionError("store miss: recsys model retrained in the serve phase")

    als_mod.als_rank2 = _boom
    als_mod.als_rank2_bucketed = _boom
    registry_relational.item_item_topk = _boom
    registry_relational.capped_basket = _boom

    spark = get_spark("recsys-scale-serve")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = registry.queries()["hybrid_recommendations"](spark, scale_probe.SCRATCH)
    n, h = _out_fingerprint(df)
    print(
        json.dumps(
            {"serve_sec": round(time.perf_counter() - t0, 1), "rows": n, "hash": h}
        ),
        flush=True,
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    import graph_scale_probe
    import scale_probe

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    os.environ["SPARK_GRAFT_STORE_DIR"] = STORE
    shutil.rmtree(STORE, ignore_errors=True)

    spark = get_spark("recsys-scale-train")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    scale_probe.build(spark, replicas, tables=SRC_TABLES)
    print(json.dumps({"replicas": replicas, "build_sec": round(time.perf_counter() - t0, 1)}), flush=True)

    qs = registry.queries()
    results: dict[str, dict] = {}
    # als_factors first: hybrid rides the memo-shared fit, so the ALS train
    # cost lands here and hybrid's figure is the incremental model set
    # (item-item + popularity + basket) + fusion + persist.
    for name in ("als_factors", "hybrid_recommendations"):
        before = graph_scale_probe._shuffle_totals(spark)
        t0 = time.perf_counter()
        df = qs[name](spark, scale_probe.SCRATCH)
        n, h = _out_fingerprint(df)
        wall = round(time.perf_counter() - t0, 1)
        after = graph_scale_probe._shuffle_totals(spark)
        row: dict = {"sec": wall, "rows": n, "hash": h}
        if before and after:
            row["shuffle_read_mb"] = round((after[0] - before[0]) / 1e6, 1)
            row["shuffle_write_mb"] = round((after[1] - before[1]) / 1e6, 1)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    spark.stop()

    env = dict(os.environ)
    env["SPARK_GRAFT_RECSYS_SERVE"] = "1"
    env["SPARK_GRAFT_STORE_DIR"] = STORE
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    served = None
    for line in proc.stdout.splitlines():
        try:
            served = json.loads(line)
        except ValueError:
            continue
    if served is None:
        print(json.dumps({"serve_error": proc.stderr[-2000:]}), flush=True)
    else:
        served["hash_match"] = served.get("hash") == results["hybrid_recommendations"]["hash"]
        served["rows_match"] = served.get("rows") == results["hybrid_recommendations"]["rows"]
        print(json.dumps({"serve_cold_process": served}), flush=True)

    shutil.rmtree(scale_probe.SCRATCH, ignore_errors=True)
    shutil.rmtree(STORE, ignore_errors=True)


if __name__ == "__main__":
    if os.environ.get("SPARK_GRAFT_RECSYS_SERVE") == "1":
        serve_phase()
    else:
        main()
