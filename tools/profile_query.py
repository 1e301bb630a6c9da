#!/usr/bin/env python
"""Per-job wall-time breakdown for one or more registered queries — guide
§1 tooling. Runs each query against the noop sink with the Spark event
log enabled, then replays the log and prints every job's wall seconds,
description, and stage/task shape, so the expensive ACTION inside a
multi-job operator (trainer iterations, checkpoint materializations,
driver round-trips) is visible instead of one opaque total.

Usage: python tools/profile_query.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crowdsorsa_etl_spark.queries import QUERIES
from crowdsorsa_etl_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1000).count()  # warm the session

    marks: list[tuple[str, float, float]] = []
    for name in names:
        spark.sparkContext.setJobDescription(f"q:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        marks.append((name, t0, time.perf_counter()))
        spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- replay the event log (flat file or rolling v2 directory) -----
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        path = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(path):
        lines: list[str] = []
        for f in sorted(os.listdir(path)):
            if "events" in f:
                with open(os.path.join(path, f)) as fh:
                    lines.extend(fh)
    else:
        with open(path) as fh:
            lines = list(fh)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                    "callsite": ev.get("Properties", {}).get(
                        "callSite.short", ""
                    ),
                }
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "wall": (
                        si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)
                    )
                    / 1000.0,
                }
    for name, t0, t1 in marks:
        print(f"\n=== {name}: total {t1 - t0:.3f}s ===")
        sel = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j["desc"] == f"q:{name}" and "end" in j
        ]
        for jid, j in sel:
            wall = (j["end"] - j["start"]) / 1000.0
            st = "; ".join(
                f"{stages[s]['name'].split(' at ')[0]}"
                f"[{stages[s]['tasks']}t {stages[s]['wall']:.2f}s]"
                for s in j["stages"]
                if s in stages
            )
            print(f"  job {jid:>3} {wall:6.3f}s  {j['callsite']:<40} {st}")
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
