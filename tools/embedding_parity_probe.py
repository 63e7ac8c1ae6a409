#!/usr/bin/env python
"""X5 reference-parity embedding probe (r6 verdict #3).

Runs the skip-gram embedding pipeline at the REFERENCE robust operating
point — walk_len=30, num_walks=200 per node, dim=64, window=10, 10
epochs (``Node2vec_algorithm_inscripton.py:40-48``; the reference
anecdote is 15-30 min for ~57k nodes single-node) — and at the
registry's budget point (1x5 walks, dim=32, window=5, 1 epoch), and
reports for each:

- wall seconds for walk generation and for the Word2Vec fit;
- the cosine-margin quality gate (mean cosine of 2-hop-linked
  (customer, product) pairs minus hash-permuted random pairs — the
  same metric as test_node2vec_embedding_quality);
- downstream link-prediction AUC using embedding cosine as the ONLY
  score over the positive/negative pair set (J1/J4) — the delta between
  configs is the verdict-requested downstream signal, independent of
  the GBT feature stack.

Word2Vec trains with numPartitions = default parallelism at the robust
point (MLlib's documented throughput/accuracy trade; the default 1
partition would single-thread a 100M-token corpus).

Usage: python tools/embedding_parity_probe.py [sf_dir] [mode]
  mode: both (default) | robust | registry
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cos_col(a, b):
    from pyspark.sql import functions as F

    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def run_config(spark, sf_dir, name, num_walks, walk_len, dim, window, epochs, n_parts):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.graph import algorithms as alg
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.graph.build import build_edges, build_nodes
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.operators import traversals as trav
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import load_tables

    tables = load_tables(spark, sf_dir)
    edges = build_edges(tables)
    nodes = build_nodes(tables)

    t0 = time.perf_counter()
    walks = alg.random_walks(edges, num_walks=num_walks, walk_len=walk_len, seed=42)
    walks = walks.localCheckpoint(eager=True)
    n_walks = walks.count()
    t_walks = time.perf_counter() - t0

    t0 = time.perf_counter()
    w2v = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=0,
        seed=42,
        maxIter=epochs,
        numPartitions=n_parts,
        inputCol="walk",
        outputCol="vec",
    )
    model = w2v.fit(walks.select("walk"))
    emb = (
        model.getVectors()
        .select(F.col("word").alias("id"), vector_to_array("vector").alias("embedding"))
        .localCheckpoint(eager=True)
    )
    n_emb = emb.count()
    t_fit = time.perf_counter() - t0

    # cosine-margin gate (test_node2vec_embedding_quality metric)
    pos = trav.positive_pairs(edges).select("customer_id", "product_id")
    e1 = emb.select(F.col("id").alias("customer_id"), F.col("embedding").alias("ea"))
    e2 = emb.select(F.col("id").alias("product_id"), F.col("embedding").alias("eb"))
    m_link = (
        pos.join(e1, "customer_id").join(e2, "product_id")
        .agg(F.avg(cos_col(F.col("ea"), F.col("eb")))).collect()[0][0]
    )
    rnd = pos.withColumn(
        "product_id",
        F.concat(
            F.lit("prod_"),
            ((F.abs(F.xxhash64("customer_id", "product_id")) % 1000) + 1).cast("string"),
        ),
    )
    m_rand = (
        rnd.join(e1, "customer_id").join(e2, "product_id")
        .agg(F.avg(cos_col(F.col("ea"), F.col("eb")))).collect()[0][0]
    )

    # downstream: AUC of cosine-as-the-only-score over J1 positives vs J4
    # anti-join negatives
    neg = trav.negative_pairs(edges, nodes).select("customer_id", "product_id")
    scored = (
        pos.withColumn("label", F.lit(1.0))
        .unionByName(neg.withColumn("label", F.lit(0.0)))
        .join(e1, "customer_id")
        .join(e2, "product_id")
        .select("label", cos_col(F.col("ea"), F.col("eb")).alias("score"))
    )
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="score", metricName="areaUnderROC"
    ).evaluate(scored)

    out = {
        "probe": "embedding_parity",
        "config": name,
        "sf_dir": sf_dir,
        "num_walks": num_walks,
        "walk_len": walk_len,
        "dim": dim,
        "window": window,
        "epochs": epochs,
        "w2v_partitions": n_parts,
        "n_walks": n_walks,
        "n_embedded_nodes": n_emb,
        "walks_sec": round(t_walks, 1),
        "fit_sec": round(t_fit, 1),
        "cosine_margin": round(float(m_link - m_rand), 4),
        "linked_mean_cos": round(float(m_link), 4),
        "random_mean_cos": round(float(m_rand), 4),
        "cosine_score_auc": round(float(auc), 4),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    spark = get_spark("embedding-parity-probe")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    if mode in ("both", "registry"):
        run_config(spark, sf_dir, "registry_budget", 1, 5, 32, 5, 1, 1)
    if mode in ("both", "robust"):
        # epochs defaults to the reference's 10; a measured single-epoch
        # anchor projects the full wall when 10 epochs exceed the probe
        # budget (MLlib W2V per-epoch cost over a 111M-token corpus)
        run_config(spark, sf_dir, f"reference_robust_e{epochs}", 200, 30, 64, 10, epochs, par)
    if mode == "matched":
        # density-matched cross-SF quality probe (r7 verdict #6): run the
        # SAME per-node corpus density (num_walks x walk_len) at two SFs
        # and compare margin/AUC — if quality tracks density rather than
        # graph size, the sf0.01 robust-config result extrapolates to the
        # 10x graph. args: [sf_dir] matched [num_walks] [walk_len]
        nw = int(sys.argv[3]) if len(sys.argv) > 3 else 40
        wl = int(sys.argv[4]) if len(sys.argv) > 4 else 20
        run_config(spark, sf_dir, f"matched_{nw}x{wl}", nw, wl, 64, 10, 1, par)


if __name__ == "__main__":
    main()
