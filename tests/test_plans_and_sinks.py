"""Physical-plan assertions (the 100-TB design mandate made testable) and
parquet sink round-trips (SURVEY §2.1 S2/S4)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _explain(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    """Predicate + column pruning must reach the parquet scan."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry

    plan = _explain(spark, registry.queries()["pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned schema: only the 6 consumed columns, not all 11
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_dim_joins_broadcast(spark):
    """Dim-table joins must be broadcast, not shuffled."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry

    plan = _explain(spark, registry.queries()["flagship_diverse_topk"](spark, SF))
    assert "BroadcastHashJoin" in plan
    plan2 = _explain(spark, registry.queries()["graph_stats"](spark, SF))
    assert "BroadcastHashJoin" in plan2  # nation x region


def test_no_cartesian_in_candidate_generation(spark):
    """The candidate cross join must be against a BROADCAST pruned product
    set (BroadcastNestedLoopJoin), never a partitioned CartesianProduct."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry

    plan = _explain(spark, registry.queries()["flagship_diverse_topk"](spark, SF))
    assert "CartesianProduct" not in plan


def test_partial_aggregation_before_shuffle(spark):
    """The aggregate must be map-side combinable: partial_sum BEFORE the
    single exchange (the shuffle carries one row per group per task, not the
    raw rows). AQE's deferred explain hides WholeStageCodegen spans, so the
    shape assertion is on the aggregate/exchange structure."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry

    import re

    plan = _explain(spark, registry.queries()["pricing_summary"](spark, SF))
    assert "partial_sum" in plan
    # tree shape: final HashAggregate <- Exchange <- partial HashAggregate
    assert re.search(r"HashAggregate \(\d+\)\n\s*\+- Exchange \(\d+\)\n\s*\+- HashAggregate", plan)


def test_dvid_partitioned_sink_roundtrip(spark, tmp_path):
    """S2/S4: edges written partitioned by dvid; snapshot read prunes
    partitions and values survive the round trip."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.graph.build import build_edges, snapshot
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import load_tables

    edges = build_edges(load_tables(spark, SF, names=("customer", "orders", "lineitem", "part", "nation", "region")))
    path = str(tmp_path / "edges")
    edges.write.mode("overwrite").partitionBy("dvid").parquet(path)

    back = spark.read.parquet(path)
    assert back.count() == edges.count()
    snap = snapshot(back, 2)
    # partition pruning visible in the scan: only dvid<=2 dirs are read
    plan = _explain(spark, snap)
    assert snap.count() == edges.filter(F.col("dvid") <= 2).count()
    assert "PartitionFilters" in plan and "dvid" in plan


def test_ml_model_persistence_roundtrip(spark, tmp_path):
    """S5 analog: pyspark.ml model save/load preserves predictions."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.ml import link_prediction as lp
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import load_tables

    tables = load_tables(spark, SF, names=("customer", "orders", "lineitem", "part", "nation", "region"))
    ds = lp.build_dataset(tables).cache()
    train, test = lp.split_train_test(ds)
    model, assembler = lp.train_gbt(train, max_iter=3, max_depth=3)
    path = str(tmp_path / "gbt")
    model.write().overwrite().save(path)

    from pyspark.ml.classification import GBTClassificationModel

    reloaded = GBTClassificationModel.load(path)
    a = model.transform(assembler.transform(test)).select("customer_id", "product_id", "prediction")
    b = reloaded.transform(assembler.transform(test)).select("customer_id", "product_id", "prediction")
    assert a.exceptAll(b).count() == 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing co-locates the 2-hop join: writing orders and lineitem
    bucketed by the join key lets the PURCHASED⋈CONTAINS join run without
    exchanging either side — the pre-partitioning strategy for the graph's
    hottest join at 100 TB."""
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import load_tables

    t = load_tables(spark, SF, names=("orders", "lineitem"))
    wh = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '{wh}'")
    (t["orders"].write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("buckdemo.orders_b"))
    (t["lineitem"].write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("buckdemo.lineitem_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (at dim-table size Spark would just
        # broadcast; bucketing matters when BOTH sides are fact-scale)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table("buckdemo.orders_b")
        li = spark.table("buckdemo.lineitem_b")
        joined = o.join(li, o.o_orderkey == li.l_orderkey).select("o_custkey", "l_partkey")
        plan = _explain(spark, joined)
        # no ShuffleExchange above either scan: bucket layout satisfies the
        # join's required distribution
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == t["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS buckdemo.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS buckdemo.orders_b")
        spark.sql("DROP DATABASE IF EXISTS buckdemo")
