#!/usr/bin/env python
"""Recall probe AT the 100x budget-binding IVF-PQ point (r10 verdict #1 /
r11 task): 200k clustered (mixture-of-Gaussians) vectors, ivf_pq_topk
ALL-AUTO — sqrt-n gives 448 cells, the IVF_AUTO_MAX_CANDIDATES=4096
budget binds the auto probe count 28 -> 9 (4,014 candidates/query).

The r10 round measured this point's COST (1,835.9 s on replicated sf0.1
embeddings, SCALE.md r10) and gated its RECALL only at the small binding
fixture (n=4096, budget 256, tests/test_ann_recall_clustered.py). This
probe measures recall@5 at the production-shaped point itself: exact
numpy ground truth on a deterministic evenly-spaced 512-query sample
(every cluster sampled; engine convention — cosine 6dp, self excluded,
ties by id). SCALE.md's "(measured)" claim for the capped default rests
on this number.

Geometry matches the test fixture (_mog: sigma=0.05, 64-d, seed 7);
n_clusters=64 follows the 70k fixture's density (cluster population
3,125 >> k). Reference anchor: knn_similarity.py:69-73 (the reference's
KNN is exact, so every approximation default owes a quality number
where it binds).

Usage: python tools/ivf_budget_recall_probe.py [n] [n_clusters] [n_sample] [mode]

``mode``:

- ``topk`` (default) — the inline all-auto ``ivf_pq_topk`` over the full
  corpus (every vector is a query). At 200k UNIQUE vectors the per-query
  ADC window moves ~800M incompressible skinny rows through one local
  disk (~10 B/row × spill generations) — fine on a cluster where the
  exchange is distributed, but it filled this host's 56 GB free on the
  first attempt (the r10 COST probe at the same shape survived because
  its corpus was 100×-replicated sf0.1 vectors: 2k distinct embeddings
  compress ~100× in the shuffle).
- ``search`` — the serve path: ``ivf_pq_train`` (all-auto cells) on the
  corpus, then ``ivf_pq_search`` of ONLY the sampled queries against the
  stored index with ``index_vectors`` = the corpus. The auto resolution
  (cells, capped probes, co-scaled rerank) is computed against the
  STORED index's n, so it binds identically to the inline path, and the
  deterministic codebook/coarse-quantizer convention makes per-query
  output IDENTICAL to ivf_pq_topk's rows for those queries (the
  designed store-roundtrip property, ivf_pq_train docstring) — verified
  empirically by ``check`` below. Candidate volume is |Q|·budget.
- ``check`` — run BOTH paths at a small n and assert the sampled-query
  rows are identical (query_id, neighbor_id, cosine), then print recall
  for each. Run this once at n=4096 before trusting a large ``search``.

Prints one JSON line per step; the SCALE.md row is written by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 5


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_sample = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    mode = sys.argv[4] if len(sys.argv) > 4 else "topk"

    import pandas as pd

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.operators import (
        similarity as sim,
    )
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import (
        get_spark,
    )

    # same geometry as tests/test_ann_recall_clustered._mog (seed 7)
    rng = np.random.default_rng(7)
    dim, sigma = 64, 0.05
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64)
    mat = centers[ids % n_clusters] + sigma * rng.normal(size=(n, dim))

    cells = sim._auto_cells(n)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        probes = sim._cap_auto_probes(
            sim._auto_probes(cells), n, cells, sim.IVF_AUTO_MAX_CANDIDATES, "probe"
        )
    cfg = {
        "n": n,
        "n_clusters": n_clusters,
        "auto_cells": cells,
        "auto_probes_uncapped": sim._auto_probes(cells),
        "auto_probes_capped": probes,
        "budget": sim.IVF_AUTO_MAX_CANDIDATES,
        "candidates_per_query": probes * (n // cells),
    }
    print(json.dumps({"config": cfg}), flush=True)

    # exact ground truth on the evenly-spaced query sample (engine
    # convention: cosine rounded 6dp, self excluded, order by -cos, id)
    qidx = np.linspace(0, n - 1, num=min(n, n_sample), dtype=np.int64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    U = mat / norms[:, None]
    t0 = time.perf_counter()
    sims_q = np.round(U[qidx] @ U.T, 6)  # n_sample x n
    truth: dict[int, set] = {}
    for row, i in enumerate(qidx):
        s = sims_q[row]
        s[i] = -np.inf
        order = np.lexsort((ids, -s))[:K]
        truth[int(ids[i])] = set(int(x) for x in ids[order])
    print(json.dumps({"truth_sec": round(time.perf_counter() - t0, 1)}), flush=True)

    spark = get_spark("ivf-budget-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<double>").repartition(64)
    emb = emb.localCheckpoint(eager=True)

    qset = set(int(i) for i in ids[qidx])

    def run_topk():
        res = sim.ivf_pq_topk(emb, k=K)  # all-auto: the budget binds 28 -> 9
        return res.where(res["query_id"].isin(list(qset))).collect()

    def run_search():
        index = sim.ivf_pq_train(emb)  # all-auto sqrt-n cells
        queries = emb.where(emb["vec_id"].isin(list(qset))).localCheckpoint(eager=True)
        return sim.ivf_pq_search(queries, index, k=K, index_vectors=emb).collect()

    def recall_of(rows):
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / (K * len(truth))

    if mode == "check":
        rows_t = run_topk()
        rows_s = run_search()
        set_t = {(int(r["query_id"]), int(r["neighbor_id"]), r["cosine"]) for r in rows_t}
        set_s = {(int(r["query_id"]), int(r["neighbor_id"]), r["cosine"]) for r in rows_s}
        print(
            json.dumps(
                {
                    "paths_identical": set_t == set_s,
                    "only_topk": len(set_t - set_s),
                    "only_search": len(set_s - set_t),
                    "recall_topk": round(recall_of(rows_t), 4),
                    "recall_search": round(recall_of(rows_s), 4),
                    **cfg,
                }
            ),
            flush=True,
        )
        if set_t != set_s:
            raise SystemExit("PATH MISMATCH: search-derived recall is NOT a valid proxy")
        return

    t0 = time.perf_counter()
    rows = run_topk() if mode == "topk" else run_search()
    wall = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                f"ivf_pq_all_auto_capped_{mode}": {
                    "search_plus_sample_collect_sec": wall,
                    "sampled_queries": len(truth),
                    "recall_at_5": round(recall_of(rows), 4),
                    **cfg,
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
