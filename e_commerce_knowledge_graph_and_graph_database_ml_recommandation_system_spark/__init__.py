"""PySpark-native graph-analytics & recommendation engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline
(Deleuzy/E-commerce-Knowledge-Graph-and-Graph-database-ML-recommandation-system):
relational ETL -> property-graph construction -> graph feature engineering ->
link-prediction ML -> diversity-aware top-k recommendation serving, plus the
large-scale training-data-pipeline operators (dedup, ANN similarity, text
analysis, multimodal plumbing) the 100-TB north star requires.

Design principles (see SURVEY.md):
- Property graph = two DataFrames (``nodes``, ``edges``) with typed columns,
  immutable, versioned by ``dvid`` — never a mutable in-memory graph.
- Every operator is declarative DataFrame/SQL so Catalyst does pushdown,
  pruning, join selection; Python UDFs only where semantics demand
  (grouped sequential selection), and then Arrow-batched.
- No driver-side collect of row-scale data; broadcast only dim tables.
"""

from .session import get_spark  # noqa: F401

__all__ = ["get_spark"]
__version__ = "0.1.0"
