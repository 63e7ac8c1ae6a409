"""Rank-2 weighted alternating least squares — the classic collaborative-
filtering factorizer, engine-exact and fully hash-oracle-able.

The reference serves recommendations from supervised link prediction plus
node2vec similarity (``xgboost_training_for_big_data.py``,
``took_recommandations_softmaxsampling_discount.py``); the memory-based item-item CF
neighbor query (``item_item_neighbors``) covers the neighborhood method.
ALS is the model-based CF baseline every production recommender evaluates
against, so it joins the beyond-reference pipeline surface. MLlib's ALS is
RNG/engine-private (its seeds and LAPACK solves cannot be mirrored in SQL),
so — like ``kmeans_codebook`` vs MLlib KMeans — this is a deterministic
trainer built from first principles on DataFrame aggregates.

Rank 2 keeps the per-entity normal-equation solve CLOSED FORM (a 2x2
system: Cramer's rule in four scalar expressions), which means the whole
trainer is plain JVM column arithmetic — no UDFs, no per-row matrix
library, no driver-side loop over entities. The same dataflow at any rank r
would aggregate r*(r+1)/2 Gram entries + r RHS entries per key and solve
with a small applyInPandas; rank 2 is chosen exactly so the solve stays
inside whole-stage codegen AND the unrolled DuckDB oracle can replay every
iterate bit-for-bit.

Engine-exactness follows the repo's iterative-numerics convention
(kmeans_lloyd / power_iteration_pc1): every per-row product is rounded to
9dp before DECIMAL(26,12) accumulation (order-free exact sums), each solved
factor re-rounds to 12dp, and scalar arithmetic is spelled with identical
operation order in both engines (inexact literals like the 0.1
regularizer multiply as DOUBLE on both sides — DuckDB would otherwise
parse 0.1 as DECIMAL and compute lam*n exactly, diverging from Spark's
double multiply).

Scale: per half-step the dataflow is one equi-join of the interaction
table with the current |P|- (or |C|-) row factor table on its key plus one
keyed aggregate — the alternating shuffle is inherent to ALS and is the
same join-aggregate pattern a 1000-executor run co-partitions on (c, p).
Per-iteration state is the two factor tables (2 doubles per entity);
nothing is ever |C| x |P|. Factor tables are eagerly localCheckpointed per
half-step (the iterative-job disk-hygiene rule: unbounded lazy lineage
holds every step's shuffle files live).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_int32

_DEC = "decimal(26,12)"


#: bump when this trainer's persisted factor output changes (r10, r9
#: verdict #4): folded into every store tag via recsys_store.versioned_tag
#: so a trainer-code change invalidates the artifact store automatically.
ALGO_VERSION = 1


def _init_factors(inter: DataFrame, key: str, salt: str) -> DataFrame:
    """Deterministic md5-seeded factors in (-0.5, 0.5): the same
    hash-uniform init convention as power_iteration_pc1's direction."""

    def h(tag: str) -> F.Column:
        return (
            F.round(
                md5_int32(F.concat(F.lit(tag), F.col(key).cast("string")))
                / F.lit(2147483648.0)
                - F.lit(1.0),
                9,
            )
            * F.lit(0.5)
        )

    return (
        inter.select(key)
        .distinct()
        .select(key, h(f"als{salt}A_").alias("f1"), h(f"als{salt}B_").alias("f2"))
    )


def _solve_step(
    inter: DataFrame,
    factors: DataFrame,
    key_in: str,
    key_out: str,
    lam: float,
    checkpoint: bool = True,
) -> DataFrame:
    """One ALS half-step: given the factor table keyed by ``key_in``,
    solve the regularized 2x2 normal equations per ``key_out`` entity.

    ALS-WR weighted-lambda regularization (lam * n_interactions on the
    diagonal) keeps the determinant >= lam*n*(a11+a22+lam*n) > 0 by
    Cauchy-Schwarz, so the closed-form division never degenerates.
    """
    agg = (
        inter.join(factors, key_in)
        .groupBy(key_out)
        .agg(
            F.sum(F.round(F.col("w") * F.col("f1") * F.col("f1"), 9).cast(_DEC)).alias("a11d"),
            F.sum(F.round(F.col("w") * F.col("f1") * F.col("f2"), 9).cast(_DEC)).alias("a12d"),
            F.sum(F.round(F.col("w") * F.col("f2") * F.col("f2"), 9).cast(_DEC)).alias("a22d"),
            F.sum(F.round(F.col("w") * F.col("f1"), 9).cast(_DEC)).alias("b1d"),
            F.sum(F.round(F.col("w") * F.col("f2"), 9).cast(_DEC)).alias("b2d"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a11 = F.col("a11d").cast("double") + F.lit(lam) * F.col("n").cast("double")
    a22 = F.col("a22d").cast("double") + F.lit(lam) * F.col("n").cast("double")
    a12 = F.col("a12d").cast("double")
    b1 = F.col("b1d").cast("double")
    b2 = F.col("b2d").cast("double")
    det = a11 * a22 - a12 * a12
    out = agg.select(
        key_out,
        F.round((a22 * b1 - a12 * b2) / det, 12).alias("f1"),
        F.round((a11 * b2 - a12 * b1) / det, 12).alias("f2"),
    )
    # checkpoint=False: the bucketed trainer materializes each half-step
    # through its bucketed table write instead
    return out.localCheckpoint(eager=True) if checkpoint else out


def als_rank2(
    inter: DataFrame, alternations: int = 2, lam: float = 0.1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train rank-2 weighted ALS on an interaction table.

    ``inter`` must have columns (c, p, w): user key, item key, positive
    interaction weight (implicit-feedback confidence; here purchase
    counts). The implicit target is r = 1 for every observed pair,
    weighted by w — the ALS-WR formulation restricted to observed
    entries. Returns (inter materialized, X, Y) where X = (c, f1, f2)
    and Y = (p, f1, f2) after ``alternations`` full U->I sweeps.
    """
    inter = inter.select("c", "p", F.col("w").cast("double").alias("w")).localCheckpoint(
        eager=True
    )
    y = _init_factors(inter, "p", "Y").localCheckpoint(eager=True)
    x = None
    for _ in range(alternations):
        x = _solve_step(inter, y, "p", "c", lam)
        y = _solve_step(inter, x, "c", "p", lam)
    return inter, x, y


def als_rank2_bucketed(
    inter: DataFrame,
    alternations: int = 2,
    lam: float = 0.1,
    n_buckets: int = 32,
    table_prefix: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """als_rank2 with the STORAGE-SIDE layout remedy for the alternating
    shuffle (SCALE.md 30x probe: the plain path's half-step SMJ sorts
    spill at ~17M interactions on local[32]; 2.1x over linear). The
    interaction table is written ONCE bucketed by each half-step's join
    key (c and p copies), and every solved factor table is written
    bucketed by ITS key — so each half-step's join reads co-located
    buckets with zero Exchange on the join; only the output-keyed
    aggregate shuffles (the irreducible part). This is exactly the
    co-partitioned layout a 1000-executor ALS job keeps in storage.

    Factors are BIT-IDENTICAL to als_rank2's (decimal-exact sums are
    order-free, so physical layout cannot change a single bit —
    gate-tested end to end in tests/test_plans_and_sinks.py). The
    ``table_prefix``_* managed tables are TRANSIENT scratch: the final
    factors are eager-localCheckpointed (dimension-table-sized — 2 doubles
    per entity) and every half-step table is dropped in a finally, so
    repeated bench/test runs leave zero warehouse residue (r7 ADVICE #3).
    The returned ``inter`` is the projected input, NOT re-materialized —
    consumers needing a pinned interaction table checkpoint it themselves
    (both current callers already hold their own).
    """
    from ..sources.tables import read_bucketed, write_bucketed

    spark = inter.sparkSession
    if table_prefix is None:
        # scope the default table names per Spark app: two apps sharing the
        # repo warehouse (parallel test runs) must not DROP each other's
        # in-flight half-step tables mid-train
        app = "".join(
            ch if ch.isalnum() else "_" for ch in spark.sparkContext.applicationId
        ).lower()
        table_prefix = f"als_scale_{app}"
    inter = inter.select("c", "p", F.col("w").cast("double").alias("w"))
    created: list[str] = []

    def as_bucketed(df: DataFrame, key: str, name: str) -> DataFrame:
        # repartition on the bucket key first: the write then emits one
        # file per bucket instead of one per (task, bucket)
        write_bucketed(
            df.repartition(n_buckets, key), name, key, n_buckets=n_buckets, sort_col=key
        )
        created.append(name)
        return read_bucketed(spark, name)

    try:
        inter_p = as_bucketed(inter, "p", f"{table_prefix}_inter_p")
        inter_c = as_bucketed(inter, "c", f"{table_prefix}_inter_c")
        y = as_bucketed(_init_factors(inter_p, "p", "Y"), "p", f"{table_prefix}_y")
        x = None
        for i in range(alternations):
            x = as_bucketed(
                _solve_step(inter_p, y, "p", "c", lam, checkpoint=False),
                "c",
                f"{table_prefix}_x{i + 1}",
            )
            y = as_bucketed(
                _solve_step(inter_c, x, "c", "p", lam, checkpoint=False),
                "p",
                f"{table_prefix}_y{i + 1}",
            )
        # pin the factors OFF the managed tables before the finally drops
        # them (localCheckpoint copies the rows; drop then only reclaims
        # the transient bucketed layout)
        x = x.localCheckpoint(eager=True)
        y = y.localCheckpoint(eager=True)
        return inter, x, y
    finally:
        for name in created:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def als_fit_report(inter: DataFrame, x: DataFrame, y: DataFrame) -> DataFrame:
    """Global weighted fit of the factorization over observed pairs:
    one row with (wsse, sw) as exact DECIMAL sums of 9dp-rounded terms."""
    pred = (
        inter.join(x.select("c", F.col("f1").alias("x1"), F.col("f2").alias("x2")), "c")
        .join(y.select("p", F.col("f1").alias("y1"), F.col("f2").alias("y2")), "p")
        .select(
            "w",
            F.round(
                F.col("x1") * F.col("y1") + F.col("x2") * F.col("y2"), 9
            ).alias("dot"),
        )
    )
    err = F.col("w") * (F.lit(1.0) - F.col("dot")) * (F.lit(1.0) - F.col("dot"))
    return pred.agg(
        F.sum(F.round(err, 9).cast(_DEC)).cast("double").alias("wsse_d"),
        F.sum(F.col("w").cast(_DEC)).cast("double").alias("sw_d"),
    )


def als_fold_in(inter_new: DataFrame, y: DataFrame, lam: float = 0.1) -> DataFrame:
    """Fold in NEW users against a trained item-factor table: one U-step
    (the regularized 2x2 solve) over their observed interactions — the
    standard cold-start serving path (no retraining; item factors frozen).
    Items absent from the trained Y simply drop out of the inner join
    (fold-in covers known items only — the cold-ITEM side needs a
    retrain). Returns (c, f1, f2)."""
    inter_new = inter_new.select(
        "c", "p", F.col("w").cast("double").alias("w")
    ).localCheckpoint(eager=True)
    return _solve_step(inter_new, y, "p", "c", lam)
