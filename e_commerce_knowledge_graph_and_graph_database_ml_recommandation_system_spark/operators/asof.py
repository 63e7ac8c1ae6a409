"""As-of join — the time-series operator Spark lacks natively, composed
from a union + carry-forward window (the distributed formulation; no
per-row subquery, no range explosion).

For each left row, attach the LATEST right row with right_ts <= left_ts
within the same key. Shape: tag both sides, align schemas, union, then one
window per key ordered by (ts, right-first) carrying the right payload
forward with last(ignorenulls). One shuffle on the key — the plan a
1000-executor cluster wants: sort-within-partition, no join fan-out,
skew bounded by per-key event counts.

Tie rule: a right row at exactly left_ts matches (at-or-before), and the
right side must be pre-deduplicated to one row per (key, ts) by the caller
for engine-deterministic results — DuckDB's native ASOF JOIN (the oracle)
leaves duplicate-ts winners unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``asof_<col>`` columns from the latest right row at or
    before the left timestamp (NULLs when no such row). ``right`` columns
    other than the key/ts become payload."""
    payload = [c for c in right.columns if c not in (key, right_ts)]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        F.col(right_ts).alias(f"_p_{right_ts}"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
            if c != key
        ],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"_p_{right_ts}"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c != key],
    )
    u = r.unionByName(l)
    # The whole right payload travels as ONE struct that is non-null exactly
    # on right rows, and ONE last(ignorenulls) carries it: per-column carries
    # would tear rows when a payload field is NULL (that field would arrive
    # from an older right row than asof_ts — round-2 advice item).
    r_struct = F.when(
        F.col("_is_r") == 1, F.struct(*[F.col(f"_p_{c}") for c in [right_ts, *payload]])
    )
    # right rows sort BEFORE left rows at equal ts (at-or-before inclusive)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        key,
        "_ts",
        "_is_r",
        *[F.col(c) for c in u.columns if c.startswith("_l_")],
        F.last(r_struct, ignorenulls=True).over(w).alias("_r"),
    )
    out_left = [c for c in left.columns if c != key]
    return carried.filter(F.col("_is_r") == 0).select(
        key,
        *[F.col(f"_l_{c}").alias(c) for c in out_left],
        *[F.col("_r").getField(f"_p_{c}").alias(f"{payload_prefix}{c}") for c in [right_ts, *payload]],
    )
