#!/usr/bin/env python
"""Cost probe for the r9 ALL-AUTO IVF-PQ default (√n cells + fraction-held
probes + 3/8-of-candidates rerank) at replicated scale.

The r9 clustered-corpus gates bought RECALL for the default configuration
(a fixed n_probe decays recall as 10/√n; a fixed rerank caps it at
~rerank/cluster-population); the honest flip side is COST — holding the
probed fraction makes candidate volume ~n²/16 and the co-scaled refine
~n²/43 exact cosines (both stated in the operator docstrings). This probe
measures that price at one real operating point so SCALE.md carries a
number instead of a formula: scale-critical deployments pick a per-corpus
point with ivf_probe_recall_audit and pin all three knobs; the default
favors a correct answer over a cheap one.

Usage: python tools/ivf_auto_cost_probe.py [replicas]   (default 30)
Prints one JSON line per step; SCALE.md rows are written by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

os.environ.setdefault("SPARK_GRAFT_UI_ENABLED", "true")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    import graph_scale_probe
    import scale_probe

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.operators import (
        similarity as sim,
    )
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import (
        load_table,
    )

    spark = get_spark("ivf-auto-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    scale_probe.build(spark, replicas, tables=("embeddings",))
    print(
        json.dumps({"replicas": replicas, "build_sec": round(time.perf_counter() - t0, 1)}),
        flush=True,
    )

    emb = load_table(spark, "embeddings", scale_probe.SCRATCH)
    n = emb.count()
    cells = sim._auto_cells(n)
    probes_unc = sim._auto_probes(cells)
    # r10: the default resolution applies the per-query candidate budget
    # (IVF_AUTO_MAX_CANDIDATES) — print BOTH so the row shows when it binds
    probes = sim._cap_auto_probes(probes_unc, n, cells, sim.IVF_AUTO_MAX_CANDIDATES, "probe")
    rerank = sim._auto_rerank(n, cells, probes)
    cfg = {
        "n": n,
        "auto_cells": cells,
        "auto_probes_uncapped": probes_unc,
        "auto_probes": probes,
        "budget": sim.IVF_AUTO_MAX_CANDIDATES,
        "auto_rerank": rerank,
        "expected_candidates_per_query": probes * (n // cells),
        "expected_candidates_per_query_uncapped": probes_unc * (n // cells),
    }
    print(json.dumps({"resolved_auto_config": cfg}), flush=True)

    before = graph_scale_probe._shuffle_totals(spark)
    t0 = time.perf_counter()
    rows = sim.ivf_pq_topk(emb, k=5).count()
    wall = round(time.perf_counter() - t0, 1)
    after = graph_scale_probe._shuffle_totals(spark)
    out: dict = {"ivf_pq_all_auto": {"sec": wall, "rows": rows, **cfg}}
    if before and after:
        out["ivf_pq_all_auto"]["shuffle_read_mb"] = round((after[0] - before[0]) / 1e6, 1)
        out["ivf_pq_all_auto"]["shuffle_write_mb"] = round((after[1] - before[1]) / 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
