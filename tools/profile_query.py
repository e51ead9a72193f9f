#!/usr/bin/env python
"""Per-stage profile of one registered query (r12 measurement helper).

Runs the named query to a noop sink (warm-up + timed pass) with the
Spark UI enabled, then dumps per-job wall time and per-stage metrics
(duration, tasks, input/shuffle bytes, rows) from the REST API — the
guide §1.1 empirical loop without leaving the terminal.

    python tools/profile_query.py <query> [--sf DIR] [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from credit_card_etl_pipeline_spark import queries as q
    from credit_card_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="profile_query",
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl

    def rest(path: str):
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
            return json.load(r)

    for name in args.names:
        fn = q.QUERIES[name]
        walls = []
        for i in range(args.repeats):
            spark.sparkContext.setJobGroup(f"{name}:{i}", f"{name} pass {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"\n=== {name}: walls {[round(w, 3) for w in walls]}")

        jobs = rest("jobs")
        # jobs of the LAST pass only (group id endswith :last)
        last = f"{name}:{args.repeats - 1}"
        jobs = [j for j in jobs if j.get("jobGroup") == last]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"jobs in final pass: {len(jobs)}, stages: {len(stage_ids)}")
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            sub = j.get("submissionTime", "")
            dur = ""
            try:
                from datetime import datetime

                st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                en = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(en - st).total_seconds():7.3f}s"
            except Exception:
                pass
            print(f"  job {j['jobId']:>4} {dur}  stages={j['stageIds']}  {j.get('description', '')[:60]}")
        stages = {s["stageId"]: s for s in rest("stages?status=complete")}
        rows = []
        for sid in stage_ids:
            s = stages.get(sid)
            if not s:
                continue
            rows.append(
                (
                    s.get("executorRunTime", 0) / 1000.0,
                    sid,
                    s["numCompleteTasks"],
                    s.get("inputBytes", 0) >> 20,
                    s.get("shuffleReadBytes", 0) >> 20,
                    s.get("shuffleWriteBytes", 0) >> 20,
                    s.get("numTasks", 0),
                    (s.get("name") or "")[:70],
                )
            )
        rows.sort(reverse=True)
        print("  execRunTime  stage  tasks  in_MB  sr_MB  sw_MB  name")
        for r in rows[:25]:
            print(
                f"  {r[0]:10.3f}s  {r[1]:>5}  {r[2]:>5}  {r[3]:>5}  {r[4]:>5}  {r[5]:>5}  {r[7]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
