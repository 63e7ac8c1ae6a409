#!/usr/bin/env python
"""100x iterative-graph scale probe (r7 verdict #5): run the eager
iterative builders — pagerank power steps, the k-core peel loop, the
multi-source landmark BFS — over a ~18M-node replicated graph, reporting
the two numbers the 30x probe could not settle:

- PER-ITERATION wall: each builder executes one iteration's dataflow at
  its eager localCheckpoint, so timing the checkpoint calls times the
  iterations (same interception point as plans/_memo.capturing_checkpoints,
  patched on the classic DataFrame class — the dispatch base never
  intercepts).
- SHUFFLE BYTES: per-query deltas of executor shuffle read/write totals
  from the Spark REST status API (spark.ui.enabled flipped on via
  SPARK_GRAFT_UI_ENABLED; /api/v1/.../stages summed across completed
  stages). At 100-TB posture the question is whether shuffle volume per
  iteration stays proportional to |E| — a superlinear curve here is the
  scale-killer the extrapolation must exclude.

Usage: python tools/graph_scale_probe.py [replicas] [query ...]
(default 100 replicas; default queries below). Prints one JSON line and
appends nothing — SCALE.md rows are written by hand from the output.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

os.environ.setdefault("SPARK_GRAFT_UI_ENABLED", "true")

DEFAULT_QUERIES = ("graph_pagerank", "kcore_members", "landmark_distances")
# the iterative-graph family reads only the property-graph sources
GRAPH_SRC_TABLES = ("customer", "orders", "lineitem", "part")


@contextlib.contextmanager
def timing_checkpoints():
    """Yield a list that accumulates (seconds, n_partitions) per eager
    localCheckpoint — the per-iteration wall of the eager builders."""
    from pyspark.sql.classic.dataframe import DataFrame

    marks: list[float] = []
    orig = DataFrame.localCheckpoint

    def wrapper(self, eager: bool = True):
        t0 = time.perf_counter()
        out = orig(self, eager=eager)
        marks.append(round(time.perf_counter() - t0, 2))
        return out

    DataFrame.localCheckpoint = wrapper
    try:
        yield marks
    finally:
        DataFrame.localCheckpoint = orig


def _shuffle_totals(spark, _attempt: int = 0) -> tuple[int, int] | None:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages so
    far, via the REST status API. None when the UI is unreachable; one
    retry with a longer timeout and a stderr note (r9: two probe runs
    silently lost their shuffle columns to a swallowed fetch failure)."""
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return None
        with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=30) as r:
            apps = json.load(r)
        app_id = apps[0]["id"]
        read = write = 0
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=120
        ) as r:
            for st in json.load(r):
                read += st.get("shuffleReadBytes", 0)
                write += st.get("shuffleWriteBytes", 0)
        return read, write
    except Exception as e:  # noqa: BLE001 — metrics are best-effort
        if _attempt == 0:
            time.sleep(5)
            return _shuffle_totals(spark, _attempt=1)
        print(f"shuffle-totals fetch failed: {type(e).__name__}: {e}", file=sys.stderr)
        return None


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = tuple(sys.argv[2:]) or DEFAULT_QUERIES

    import scale_probe

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    spark = get_spark("graph-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    scale_probe.build(spark, replicas, tables=GRAPH_SRC_TABLES)
    build_s = round(time.perf_counter() - t0, 1)

    qs = dict(registry.queries())

    # probe-only entry (r8 verdict #6): the production-shaped linear
    # negative sampler — a fixed multiple of the positives, the dataset-
    # assembly step the r8 probe had to exclude while only the quadratic
    # fixed-relation sampler existed. Not a registry query (the oracle-
    # checked registry keeps the fixed-relation form); the operator's
    # correctness gates live in tests/test_invariants.py.
    def _negative_pairs_linear(spark_, sf_dir_):
        from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.operators import (
            traversals as trav,
        )
        from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import (
            load_table,
        )

        return trav.negative_pair_keys_linear(
            load_table(spark_, "orders", sf_dir_),
            load_table(spark_, "lineitem", sf_dir_),
            load_table(spark_, "part", sf_dir_),
            ratio=1,
        )

    qs["negative_pairs_linear"] = _negative_pairs_linear

    results: dict[str, dict] = {}
    for name in names:
        before = _shuffle_totals(spark)
        t0 = time.perf_counter()
        with timing_checkpoints() as iters:
            n_rows = qs[name](spark, scale_probe.SCRATCH).count()
        wall = round(time.perf_counter() - t0, 1)
        after = _shuffle_totals(spark)
        row: dict = {"sec": wall, "rows": n_rows, "iter_checkpoint_sec": iters}
        if before and after:
            row["shuffle_read_mb"] = round((after[0] - before[0]) / 1e6, 1)
            row["shuffle_write_mb"] = round((after[1] - before[1]) / 1e6, 1)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(
        json.dumps(
            {
                "probe": "graph_scale",
                "replicas": replicas,
                "build_sec": build_s,
                "queries": results,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
