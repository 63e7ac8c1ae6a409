#!/usr/bin/env python
"""Streaming scale probes (r6 verdict #7): the two streaming pipelines at
replicated sf0.1, with STATE-SIZE and WATERMARK readings — the batch
probes (tools/scale_probe.py) answer "does the plan survive N× rows";
this answers the streaming-specific questions: does stream-stream join
state stay bounded by the time-range predicate + watermark as volume
grows, and does the curation pipeline's admitted-state table grow only
with admissions?

Probe A — events_stream_attribution (stream-stream interval join):
  replicated events are re-laid-out as range-partitioned-by-ts files with
  ascending mtimes (time-ordered arrival, the production shape), streamed
  with maxFilesPerTrigger=1 so the drain runs many micro-batches and the
  1-hour watermark actually advances/evicts between them. Reported per
  replica factor: output rows vs the batch interval-join rows (unified-
  semantics check under multi-batch arrival), max join state rows held
  (stateOperators numRowsTotal), rows dropped by the watermark, wall.

Probe B — documents_stream_curation (foreachBatch admission):
  n_batches=4 micro-batches over replicated documents (every doc N×
  verbatim — worst-case near-dup density). foreachBatch holds NO engine
  state; its state is the admitted parquet table — reported as admitted
  rows + on-disk bytes, plus per-micro-batch wall from query progress.

Usage: python tools/streaming_scale_probe.py [replicas]
Prints one JSON line. Uses tools/scale_probe.py's replication machinery.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import scale_probe as sp  # noqa: E402


def _as_dict(pr) -> dict:
    """Normalize a StreamingQueryProgress (dict-like object in PySpark 3.5+,
    plain dict earlier) to a plain dict via its json form."""
    if isinstance(pr, dict):
        return pr
    try:
        return json.loads(pr.json)
    except Exception:
        return {}


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import functions as F

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.sources.tables import load_table
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.streaming.ingest import (
        stream_curated_ingest,
    )
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.streaming.windows import (
        stream_stream_attribution,
    )

    spark = get_spark("streaming-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    sp.build(spark, replicas)
    build_sec = round(time.perf_counter() - t0, 1)
    scratch = sp.SCRATCH
    out: dict = {"probe": "streaming_scale", "replicas": replicas, "build_sec": build_sec}

    try:
        # ---- probe A: stream-stream attribution ----
        # re-lay events as ~16 range-partitioned-by-ts files, mtimes
        # ascending: time-ordered arrival so the watermark advances and
        # EVICTS between micro-batches
        attr_root = tempfile.mkdtemp(prefix="attr_probe_")
        ev_dir = f"{attr_root}/events.parquet"
        ev = load_table(spark, "events", scratch)
        n_events = ev.count()
        ev.repartitionByRange(16, "ts").write.mode("overwrite").parquet(ev_dir)
        base = time.time() - 7200
        parts = sorted(f for f in os.listdir(ev_dir) if f.startswith("part-"))
        for i, f in enumerate(parts):
            os.utime(os.path.join(ev_dir, f), (base + i, base + i))

        prog: list = []
        t0 = time.perf_counter()
        res = stream_stream_attribution(
            spark, attr_root, lookback_minutes=240,
            max_files_per_trigger=1, progress_out=prog,
        )
        stream_rows = res.count()
        attr_sec = round(time.perf_counter() - t0, 1)
        prog = [_as_dict(p) for p in prog]

        # batch interval join = ground truth for the unified-semantics check
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
        )
        v = ev.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("vid"), F.col("user_id").alias("vu"), F.col("ts").alias("vts")
        )
        batch_rows = (
            p.join(
                v,
                (F.col("vu") == F.col("user_id"))
                & (F.col("vts") <= F.col("pts"))
                & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 240 MINUTES")),
            ).count()
        )
        state_rows = [
            so.get("numRowsTotal", 0)
            for pr in prog
            for so in (pr.get("stateOperators") or [])
        ]
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for pr in prog
            for so in (pr.get("stateOperators") or [])
        )
        out["attribution"] = {
            "events": n_events,
            "micro_batches": len(prog),
            "wall_sec": attr_sec,
            "stream_rows": stream_rows,
            "batch_join_rows": batch_rows,
            "max_state_rows": max(state_rows) if state_rows else None,
            "rows_dropped_by_watermark": dropped,
            "last_watermark": (prog[-1].get("eventTime") or {}).get("watermark") if prog else None,
        }
        shutil.rmtree(attr_root, ignore_errors=True)
        print(json.dumps({"partial": out["attribution"]}), flush=True)

        # ---- probe B: curated streaming ingest ----
        cur_root = tempfile.mkdtemp(prefix="curation_probe_")
        prog2: list = []
        t0 = time.perf_counter()
        counts = stream_curated_ingest(
            spark, scratch, f"{cur_root}/state", f"{cur_root}/ckpt",
            n_batches=4, progress_out=prog2,
        ).collect()
        cur_sec = round(time.perf_counter() - t0, 1)
        prog2 = [_as_dict(p) for p in prog2]
        out["curation"] = {
            "docs": spark.read.parquet(f"{scratch}/documents.parquet").count(),
            "micro_batches": len(prog2),
            "wall_sec": cur_sec,
            "admitted_per_batch": {int(r["batch_id"]): int(r["admitted"]) for r in counts},
            "state_rows": int(sum(r["admitted"] for r in counts)),
            "state_bytes": _dir_bytes(f"{cur_root}/state"),
            "batch_durations_ms": [
                (pr.get("durationMs") or {}).get("triggerExecution") for pr in prog2
            ],
        }
        shutil.rmtree(cur_root, ignore_errors=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
