"""Flagship query: top-k diverse recommendations by popularity×recency.

The reference's core retrieval shape (EP3, SURVEY §3) without the learned
model: candidate generation with purchased-exclusion, popularity/recency
scoring, category-diverse top-k per customer. Pure DataFrame ops — scans,
broadcast + anti joins, aggregation, stacked windows — and DuckDB-oracle
checkable end to end.

reference trace: valid-product filter ``topk_recommandations_diverse_
nodiscounts.py:189-201`` → exclusion ``:217-226`` → scoring ``:256-262``
(model prob; here popularity×recency proxy) → greedy diverse pick ``:279-296``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_tables

AS_OF = "2002-01-01"


def scored_valid_products(tables: dict) -> DataFrame:
    """Valid products (P10 analog) scored by popularity × recency decay
    (reference scoring proxy at ``topk_recommandations_diverse_
    nodiscounts.py:256-262``). Columns: p_partkey, p_name, category, score."""
    part, lineitem = tables["part"], tables["lineitem"]
    prod_stats = lineitem.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.count("*").alias("popularity"),
        F.datediff(F.lit(AS_OF).cast("date"), F.max("l_shipdate").cast("date")).alias("recency_days"),
    )
    return (
        part.filter((F.col("p_size") > 0) & F.col("p_type").isNotNull())
        .join(prod_stats, "p_partkey", "left")
        .na.fill({"popularity": 0, "recency_days": 3650})
        .select(
            F.col("p_partkey"),
            F.col("p_name"),
            F.col("p_type").alias("category"),
            F.round(F.col("popularity") / (F.lit(1.0) + F.col("recency_days") / F.lit(365.0)), 6).alias("score"),
        )
    )


def purchased_pairs(tables: dict) -> DataFrame:
    """Distinct (c_custkey, p_partkey) purchases via the 2-hop join (J1)."""
    orders, lineitem = tables["orders"], tables["lineitem"]
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_partkey"), orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("c_custkey"), F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )


def flagship(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k diverse recommendations per customer.

    Works directly on the relational tables (graph edge semantics inlined:
    orders≡PURCHASED, lineitem≡CONTAINS) so the whole plan is one Catalyst
    DAG — scans prune to the consumed columns only, `part` broadcasts, and
    the only big shuffles are the positive-pair distinct and the final
    per-customer window.
    """
    t = load_tables(spark, sf_dir, names=("customer", "orders", "lineitem", "part"))
    customer, part = t["customer"], t["part"]
    valid = scored_valid_products(t)
    # materialize the purchase pairs once: three consumers (c_max aggregate,
    # anti-join side, and nothing else recomputes orders⋈lineitem+distinct)
    purchased = purchased_pairs(t).localCheckpoint()

    # EXACT candidate pruning: the score is customer-independent, so a
    # customer's per-category winner (cat_rank=1 among their unpurchased
    # products) always sits within the category's global top (c_max + 1),
    # where c_max = max products any single customer purchased in one
    # category. Pruning each category to that prefix shrinks the candidate
    # join from |C|×|P| (300M rows at sf0.1, ~340s) to |C|×(|cats|·(c_max+1))
    # (~4M rows) with PROVABLY identical output — the physical-plan analog
    # of the reference's 1500-2000 candidate cap, but lossless.
    # c_max is a SCALAR and the pruned prefix is |cats|·(c_max+1) rows —
    # dim-table sized by construction. Materialize both eagerly (two small
    # jobs) and feed the main plan literals/broadcasts: leaving them lazy
    # duplicates the purchased-pairs subtree into every consumer (Catalyst
    # inlines shared subtrees — the same orders⋈lineitem distinct ran 3×).
    c_max = (
        purchased.join(F.broadcast(part.select("p_partkey", F.col("p_type").alias("category"))), "p_partkey")
        .groupBy("c_custkey", "category")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("c_max"))
        .collect()[0]["c_max"]
    ) or 0
    w_prune = Window.partitionBy("category").orderBy(F.desc("score"), F.asc("p_partkey"))
    pruned_rows = (
        valid.withColumn("cat_pos", F.row_number().over(w_prune))
        .filter(F.col("cat_pos") <= F.lit(c_max) + 1)
        .drop("cat_pos")
        .collect()
    )
    pruned = spark.createDataFrame(pruned_rows, schema=valid.schema)

    # candidates: every (customer, pruned product) minus purchased (J6/J7).
    # The exclusion only matters for products that survived pruning, so the
    # anti side filters to pruned product keys first (lossless). No
    # broadcast hint: pruned products are the POPULAR ones, so their
    # purchase pairs can be a large slice of all purchases — AQE broadcasts
    # when the filtered side turns out small, shuffles when it doesn't.
    # Broadcast semi-join, not a literal isin list: the pruned set is
    # |cats|·(c_max+1) keys and c_max grows with the densest customer-
    # category, so an In-predicate would become a 10⁴-10⁵-literal
    # expression tree at 100× — the semi-join keeps the plan constant-size.
    purchased_rel = purchased.join(F.broadcast(pruned.select("p_partkey")), "p_partkey", "left_semi")
    candidates = (
        customer.select("c_custkey")
        .crossJoin(F.broadcast(pruned))
        .join(purchased_rel, ["c_custkey", "p_partkey"], "left_anti")
    )

    # category-diverse top-k (W6): ≤1 per category, best k overall.
    # The per-category winner (row_number=1 over score desc, p_partkey asc)
    # is an argmax — computed as max_by over an ordering struct
    # (score, -p_partkey), a HASH aggregate with map-side partials: the
    # full candidate volume collapses to one row per (customer, category)
    # BEFORE the shuffle, where a sort window would shuffle+sort every
    # candidate row (2× runtime at sf0.1, worse with scale).
    ord_struct = F.struct(F.col("score"), (-F.col("p_partkey")).alias("np"))
    val_struct = F.struct("p_partkey", "p_name", "score")
    per_cat = (
        candidates.groupBy("c_custkey", "category")
        .agg(F.max_by(val_struct, ord_struct).alias("v"))
        .select("c_custkey", "v.p_partkey", "v.p_name", "category", "v.score")
    )
    w_all = Window.partitionBy("c_custkey").orderBy(F.desc("score"), F.asc("p_partkey"))
    return (
        per_cat.withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= k)
        .select("c_custkey", "rank", "p_partkey", "p_name", "category", "score")
    )


FLAGSHIP_ORACLE_SQL = f"""
WITH prod_stats AS (
    SELECT l_partkey AS p_partkey,
           COUNT(*) AS popularity,
           datediff('day', CAST(MAX(l_shipdate) AS DATE), DATE '{AS_OF}') AS recency_days
    FROM lineitem GROUP BY l_partkey
),
valid AS (
    SELECT p.p_partkey, p.p_name, p.p_type AS category,
           ROUND(COALESCE(s.popularity, 0) / (1.0 + COALESCE(s.recency_days, 3650) / 365.0), 6) AS score
    FROM part p LEFT JOIN prod_stats s ON p.p_partkey = s.p_partkey
    WHERE p.p_size > 0 AND p.p_type IS NOT NULL
),
purchased AS (
    SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
candidates AS (
    SELECT c.c_custkey, v.*
    FROM customer c CROSS JOIN valid v
    ANTI JOIN purchased p ON p.c_custkey = c.c_custkey AND p.p_partkey = v.p_partkey
),
cat_ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey, category ORDER BY score DESC, p_partkey ASC) AS cat_rank
    FROM candidates
),
ranked AS (
    SELECT c_custkey, p_partkey, p_name, category, score,
           ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY score DESC, p_partkey ASC) AS rank
    FROM cat_ranked WHERE cat_rank = 1
)
SELECT c_custkey, rank, p_partkey, p_name, category, score
FROM ranked WHERE rank <= 3
"""
