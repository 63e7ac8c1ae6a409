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


def shared_purchased_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memo-shared distinct purchase pairs for the serving family — the
    SAME checkpoint as ``registry.shared_positive_pairs`` (identical
    relation; the serving queries just use the relational column names).
    Delegates to the registry builder (r11 ADVICE: a mirrored build
    closure + hard-coded duplicate tag string could silently fork the
    'one shared materialization' into two if either side drifted); the
    import is function-local to avoid the registry→flagship module
    cycle."""
    from .registry import shared_positive_pairs

    pos = shared_positive_pairs(spark, sf_dir)
    return pos.select(F.col("ckey").alias("c_custkey"), F.col("pkey").alias("p_partkey"))


def shared_scored_valid_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memo-shared scored valid-product relation (part-sized: |P| rows).
    Seven serving queries derive the identical lineitem prod-stats
    aggregate + part join; one checkpoint serves them all (r11)."""
    from ._memo import memo

    def build() -> DataFrame:
        t = load_tables(spark, sf_dir, names=("part", "lineitem"))
        return scored_valid_products(t)

    return memo(spark, ("scored_valid_products", sf_dir), build)


def flagship(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k diverse recommendations per customer.

    Works directly on the relational tables (graph edge semantics inlined:
    orders≡PURCHASED, lineitem≡CONTAINS) so the whole plan is one Catalyst
    DAG — scans prune to the consumed columns only, `part` broadcasts, and
    the only big shuffles are the two purchase-pair aggregates (c_max and
    the positions fold) and the final per-customer window.
    """
    t = load_tables(spark, sf_dir, names=("customer", "part"))
    customer, part = t["customer"], t["part"]
    # memo-shared prefixes (r11 optimization round): the scored-product
    # relation and the DISTINCT purchase-pair checkpoint are the same
    # materializations ~10 other registry consumers (serving family,
    # traversal family, market-basket family) already read — flagship was
    # the last query re-deriving both per run (two orders⋈lineitem rescans
    # plus a lineitem prod-stats aggregate per execution). On the distinct
    # relation the per-(customer, category) product count is a plain
    # count(*) — the raw-pair form needed countDistinct, which Spark
    # expands into TWO exchanges keyed (c, cat, p) over all 600k raw rows.
    # The mex positions fold is unchanged: collect_set over distinct pairs
    # is the identical set.
    valid = shared_scored_valid_products(spark, sf_dir)
    purchased = shared_purchased_pairs(spark, sf_dir)

    # EXACT candidate pruning: the score is customer-independent, so a
    # customer's per-category winner (cat_rank=1 among their unpurchased
    # products) always sits within the category's global top (c_max + 1),
    # where c_max = max products any single customer purchased in one
    # category. Pruning each category to that prefix shrinks the candidate
    # join from |C|×|P| (300M rows at sf0.1, ~340s) to |C|×(|cats|·(c_max+1))
    # (~4M rows) with PROVABLY identical output — the physical-plan analog
    # of the reference's 1500-2000 candidate cap, but lossless.
    # c_max is a SCALAR and the pruned prefix is |cats|·(c_max+1) rows —
    # dim-table sized by construction. c_max stays a lazy 1-row aggregate
    # broadcast into the prune filter (the serving pruner's pattern) so
    # prefix derivation is ONE Spark job — a scalar collect would add a
    # second driver barrier for nothing.
    def _build_prune() -> DataFrame:
        cmax_df = (
            purchased.join(
                F.broadcast(part.select("p_partkey", F.col("p_type").alias("category"))), "p_partkey"
            )
            .groupBy("c_custkey", "category")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.coalesce(F.max("n"), F.lit(0)).alias("c_max"))
        )
        w_prune = Window.partitionBy("category").orderBy(F.desc("score"), F.asc("p_partkey"))
        return (
            valid.withColumn("cat_pos", F.row_number().over(w_prune))
            .crossJoin(F.broadcast(cmax_df))
            .filter(F.col("cat_pos") <= F.col("c_max") + 1)
            .drop("c_max")
        )

    # materialize the shared prefix ONCE per (app, sf_dir), executor-side
    # (it feeds two broadcast consumers below; k-independent by
    # construction — c_max+1 bounds ANY k's winner). r12: the prefix used
    # to be a per-EXECUTION localCheckpoint, re-deriving the c_max
    # aggregate chain + the |P| prune window and paying a job barrier on
    # every run; the memo makes it one materialization per app like the
    # scored-product/purchase-pair prefixes it derives from. Executor
    # block storage, not a driver round-trip (r3 advice — under
    # category-density skew c_max grows with the densest customer, so
    # driver memory must not be on that path).
    from ._memo import memo

    pruned = memo(spark, ("flagship_prune_prefix", sf_dir), _build_prune)

    # Per-(customer, category) winner WITHOUT expanding candidates (J6/J7
    # fused): the winner (best unpurchased product, score desc / p_partkey
    # asc) is the FIRST prefix position the customer did not purchase —
    # mex over their purchased positions within the prefix. So instead of
    # materializing |C|×(cats·(c_max+1)) candidate rows and anti-joining
    # (2.5M rows at sf0.1, prefix-size× more with denser categories), the
    # plan touches only the purchases that land in the prefix (one
    # broadcast equi-join on the dim-sized prefix), folds them to one
    # positions-array row per (customer, category) — array length ≤
    # c_max+1, bounded by construction — and computes the mex columnar.
    # Volume: |C|×|cats| + |prefix purchases|, never |C|×prefix.
    pip = purchased.join(F.broadcast(pruned.select("p_partkey", "category", "cat_pos")), "p_partkey")
    mex = (
        pip.groupBy("c_custkey", "category")
        .agg(F.sort_array(F.collect_set("cat_pos")).alias("pos_arr"))
        .select(
            "c_custkey",
            "category",
            # first index i (1-based) where pos_arr[i] != i; if the
            # purchased positions are exactly 1..n, the winner is n+1
            F.coalesce(
                F.array_min(
                    F.zip_with(
                        "pos_arr",
                        F.sequence(F.lit(1), F.size("pos_arr")),
                        lambda x, i: F.when(x != i, i),
                    )
                ),
                F.size("pos_arr") + 1,
            ).alias("winner_pos"),
        )
    )

    # category-diverse top-k (W6): ≤1 per category, best k overall. The
    # (customer × category) domain is |C|×|cats| rows — cats is dim-sized —
    # and customers absent from mex (nothing purchased in the prefix) take
    # winner_pos=1. A winner_pos past a short category's prefix (customer
    # purchased every valid product in it) drops in the inner join, exactly
    # like the exhausted-category case in the anti-join formulation.
    cats_df = pruned.select("category").distinct()
    per_cat = (
        customer.select("c_custkey")
        .crossJoin(F.broadcast(cats_df))
        .join(mex, ["c_custkey", "category"], "left")
        .na.fill({"winner_pos": 1})
        .join(
            F.broadcast(pruned.withColumnRenamed("category", "p_category")),
            (F.col("category") == F.col("p_category")) & (F.col("winner_pos") == F.col("cat_pos")),
        )
        .select("c_custkey", "p_partkey", "p_name", "category", "score")
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
