"""Parquet artifact store for the recommender's trained models (S4/S5
surface applied to serving).

The hybrid recommender's wall-clock cost is its upstream MODELS — the
rank-2 ALS train (4 join+aggregate half-steps over the full interaction
table) and the item-item neighbor table (anchor-restricted pair join).
A production recommender never retrains those on the serving path: it
trains offline, persists factor/neighbor tables, and the serving query
READS them (reference anchor: ``knn_similarity.py`` serves from a
precomputed similarity structure; ``xgboost_model_training.py`` persists
its model between runs). This module is that separation:

- ``fingerprint(orders, lineitem, tag)`` — a cheap source fingerprint
  (row counts + max order date + a config tag). Artifacts live under a
  fingerprint-named directory, so ANY change to the interaction sources
  or training config changes the path and forces a retrain — freshness
  by construction, no TTL heuristics (gate-tested in
  tests/test_plans_and_sinks.py).
- ``save_artifacts(path, dfs)`` — parquet-write each artifact table and
  re-read it back, so the caller always serves from the STORE (cold
  process = same dataflow, just no train).
- ``load_artifacts(spark, path, names)`` — None on miss.

Output-identity: ALS factors are 12dp-rounded doubles and the neighbor
table's cosine is 6dp — both bit-exact through a parquet roundtrip, so a
hybrid run served from the store hash-matches the inline-trained run
(and the DuckDB oracle) row for row.

Scale: the artifacts are |C|- and |P|-row tables (2 doubles per entity)
and an anchors×5 neighbor list — dimension-table-sized next to the
interaction table they were trained from; reading them is one columnar
scan each.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _default_base() -> str:
    # read the env override per call, not at import time (tests point the
    # store at a tmpdir)
    return os.environ.get(
        "SPARK_GRAFT_STORE_DIR", os.path.join(_REPO_ROOT, "spark-warehouse", "recsys_store")
    )


def fingerprint(orders: DataFrame, lineitem: DataFrame, tag: str) -> str:
    """Cheap source+config fingerprint: three count/max aggregates (one
    columnar scan each — noise next to a train) plus the training-config
    tag. Append-only interaction logs change all three components."""
    o = orders.agg(
        F.count(F.lit(1)).alias("n"), F.max("o_orderdate").alias("mx")
    ).collect()[0]
    n_li = lineitem.count()
    mx = str(o["mx"]).replace(" ", "T").replace(":", "-")
    return f"{tag}_o{o['n']}_l{n_li}_{mx}"


def fingerprint_sources(tables: dict[str, DataFrame], tag: str) -> str:
    """Fingerprint for artifacts whose training dataset reads MORE than the
    append-only interaction log. ``fingerprint()``'s count/max contract is
    only valid for orders+lineitem; a dataset that also joins dimension
    tables (customer/part/nation/region — e.g. the GBT / multi-tower
    feature assembly) can see a value remap (same row count, same max) that
    count/max never detects, silently serving a stale model.

    Here ``orders``/``lineitem`` (when present) keep the cheap count/max
    contract, and every OTHER table folds in a full content hash —
    ``sum(xxhash64(*columns))`` cast to decimal(38,0), one columnar scan
    per dimension table, order-insensitive and overflow-safe. Dimension
    tables are small by construction, so the scan is noise next to a
    train. The combined key is md5-compressed to keep store directory
    names bounded."""
    import hashlib

    parts: list[str] = [tag]
    for name in sorted(tables):
        t = tables[name]
        if name in ("orders", "lineitem"):
            date_col = "o_orderdate" if name == "orders" else "l_shipdate"
            row = t.agg(
                F.count(F.lit(1)).alias("n"),
                F.max(date_col).alias("mx") if date_col in t.columns else F.lit(None).alias("mx"),
            ).collect()[0]
            parts.append(f"{name}:{row['n']}:{row['mx']}")
        else:
            row = t.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*t.columns).cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            parts.append(f"{name}:{row['n']}:{row['h']}")
    digest = hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
    return f"{tag}_src{digest}"


def store_path(fp: str, base_dir: str | None = None) -> str:
    return os.path.join(base_dir or _default_base(), fp)


def load_artifacts(
    spark: SparkSession, path: str, names: tuple[str, ...]
) -> dict[str, DataFrame] | None:
    """Read the artifact tables under ``path``; None unless the meta marker
    says a complete save finished (a crashed half-write never serves)."""
    meta = os.path.join(path, "_META.json")
    if not os.path.isfile(meta):
        return None
    try:
        with open(meta, encoding="utf-8") as fh:
            saved = json.load(fh)
    except (ValueError, OSError):
        # a truncated/corrupt marker is a MISS, not a permanent error —
        # the caller retrains and the next save overwrites it atomically
        return None
    if set(saved.get("tables", [])) < set(names):
        return None
    return {n: spark.read.parquet(os.path.join(path, n)) for n in names}


def save_artifacts(
    spark: SparkSession, path: str, dfs: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Persist each artifact table, write the completion marker LAST, and
    return re-reads of the stored tables (the caller serves from the store
    even on the run that trained)."""
    os.makedirs(path, exist_ok=True)
    for n, df in dfs.items():
        df.write.mode("overwrite").parquet(os.path.join(path, n))
    # temp-then-rename so a crash mid-write can never leave a truncated
    # marker that poisons every later load (os.replace is atomic on POSIX)
    tmp = os.path.join(path, "_META.json.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"tables": sorted(dfs)}, fh)
    os.replace(tmp, os.path.join(path, "_META.json"))
    return {n: spark.read.parquet(os.path.join(path, n)) for n in dfs}
