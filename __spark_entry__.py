"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship query on sf0.001 (smoke)
queries()       -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY.md §2 operator
oracle_sql()    -> {name: DuckDB SQL} for the t2 hash-match correctness gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry
from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans.flagship import flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
