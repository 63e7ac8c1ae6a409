#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query (default: the bench HEADLINE list):

- captures ``explain("formatted")`` — with the registry memo DISABLED so the
  real dataflow is visible, and with inner localCheckpoint steps appended
  (the _memo.capturing_checkpoints instrument) — into
  ``plans/<tag>/<query>_<phase>.txt``;
- times REPS executions (drained with count(), the bench convention);
- attributes completed stages to each run via the UI REST API (enabled for
  this process only) and records per-stage task time, shuffle read/write
  bytes and input bytes, so "where does the time go" is a recorded number
  instead of a guess.

Usage:
  python tools/profile_headline.py --phase before [--queries q1,q2] \
      [--reps 2] [--tag r11] [--no-plans]

Writes JSON to /tmp/profile_<phase>.json and plan files under plans/<tag>/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_UI_ENABLED", "true")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stage_ids(spark) -> set[int]:
    try:
        return {s["stageId"] for s in _rest(spark, "stages")}
    except Exception:
        return set()


def _stages_between(spark, before: set[int]) -> list[dict]:
    out = []
    try:
        for s in _rest(spark, "stages"):
            if s["stageId"] in before or s["status"] not in ("COMPLETE", "FAILED"):
                continue
            out.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:120],
                    "tasks": s.get("numCompleteTasks"),
                    "executorRunTimeMs": s.get("executorRunTime"),
                    "inputMB": round(s.get("inputBytes", 0) / 1e6, 1),
                    "shufReadMB": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "shufWriteMB": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                }
            )
    except Exception:
        pass
    return sorted(out, key=lambda s: -(s["executorRunTimeMs"] or 0))


def capture_plan(spark, name: str, fn, path: str) -> None:
    from pyspark.sql import DataFrame

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import _memo

    def fmt(df) -> str:
        return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    with _memo.disabled(), _memo.capturing_checkpoints() as steps:
        try:
            df = fn(spark, SF_DIR)
            main = fmt(df) if isinstance(df, DataFrame) else str(type(df))
        except Exception as e:  # noqa: BLE001
            main = f"<plan capture failed: {e}>"
    parts = [f"== {name} : returned plan ==\n{main}"]
    for i, p in enumerate(steps):
        parts.append(f"\n== {name} : checkpointed step {i} ==\n{p}")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(parts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="before")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument(
        "--drain",
        default="count",
        choices=("count", "noop"),
        help="timed action: count() (bench comparable) or the noop sink "
        "(full materialization — guide §1.4; r12 noop-wall work)",
    )
    args = ap.parse_args()

    from bench import HEADLINE, _host_canary, _warm

    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.plans import registry
    from e_commerce_knowledge_graph_and_graph_database_ml_recommandation_system_spark.session import get_spark

    names = [n for n in args.queries.split(",") if n] or list(HEADLINE)
    spark = get_spark("profile-headline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    _warm(spark)

    plan_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {"_canary": _host_canary(), "_sf_dir": SF_DIR}
    for name in names:
        fn = qs[name]
        if not args.no_plans:
            capture_plan(spark, name, fn, os.path.join(plan_dir, f"{name}_{args.phase}.txt"))
        runs = []
        stages_last = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            before = _stage_ids(spark)
            t0 = time.perf_counter()
            if args.drain == "noop":
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, SF_DIR).count()
            dt = round(time.perf_counter() - t0, 3)
            runs.append(dt)
            stages_last = _stages_between(spark, before)
        spark.sparkContext.setJobDescription(None)
        out[name] = {"runs": runs, "min": min(runs), "stages_last_rep": stages_last[:12]}
        print(f"{name}: {runs}", file=sys.stderr)

    path = f"/tmp/profile_{args.phase}.json"
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(path)


if __name__ == "__main__":
    main()
