"""Per-stage profile of one or more registered queries (guide §1).

Runs each named query with the Spark event log enabled, forces it with
the noop sink (same timed action as bench.py), then parses the event
log into a per-job/per-stage breakdown: wall time, summed task time,
shuffle read/write bytes and rows, input bytes, and the stage's first
line of callsite — enough to map stages back to operators without the
(disabled) UI.

Usage:
    python scripts/profile_query.py QUERY [QUERY ...] [--runs 2]

Environment: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_datbricks_demo_spark.queries import QUERIES  # noqa: E402
from dbt_datbricks_demo_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def parse_eventlog(path: str) -> dict:
    """Stage-level metrics from one application's event log."""
    stages: dict[int, dict] = {}
    jobs: dict[int, dict] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except Exception:  # noqa: BLE001
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev.get("Submission Time"),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time")
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {"task_ms": 0, "n_tasks": 0})
                st["name"] = si.get("Stage Name", "")
                st["wall_ms"] = (si.get("Completion Time") or 0) - (
                    si.get("Submission Time") or 0
                )
                st["n_tasks"] = si.get("Number of Tasks", 0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {"task_ms": 0, "n_tasks": 0})
                tm = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + (
                    tm.get("Executor Run Time") or 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + (tm.get("JVM GC Time") or 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["sh_read_b"] = (
                    st.get("sh_read_b", 0)
                    + (srm.get("Remote Bytes Read") or 0)
                    + (srm.get("Local Bytes Read") or 0)
                )
                st["sh_read_rows"] = st.get("sh_read_rows", 0) + (
                    srm.get("Total Records Read") or 0
                )
                st["fetch_ms"] = st.get("fetch_ms", 0) + (
                    srm.get("Fetch Wait Time") or 0
                )
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sh_write_b"] = st.get("sh_write_b", 0) + (
                    swm.get("Shuffle Bytes Written") or 0
                )
                st["sh_write_rows"] = st.get("sh_write_rows", 0) + (
                    swm.get("Shuffle Records Written") or 0
                )
                im = tm.get("Input Metrics") or {}
                st["input_b"] = st.get("input_b", 0) + (
                    im.get("Bytes Read") or 0
                )
                pyt = 0
                for acc in ev.get("Task Info", {}).get("Accumulables", []):
                    if "python" in str(acc.get("Name", "")).lower():
                        pyt = 1
                if pyt:
                    st["python"] = True
    return {"stages": stages, "jobs": jobs}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in args.queries:
        times = []
        for r in range(args.runs):
            sc.setJobDescription(f"{name}#run{r}")
            t0 = time.perf_counter()
            QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            it = sc._jsc.sc().getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
        sc.setJobDescription(None)
        print(f"\n=== {name}: runs {[round(t, 3) for t in times]}")

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)

    # Spark 4 rolling layout: eventlog_v2_<appId>/events_1_<appId> files
    candidates = []
    for f in os.listdir(EVDIR):
        p = os.path.join(EVDIR, f)
        if f.startswith(app_id):
            candidates.append(p)
        elif os.path.isdir(p) and app_id in f:
            candidates.extend(
                os.path.join(p, g)
                for g in sorted(os.listdir(p))
                if g.startswith("events_")
            )
    assert candidates, f"no event log for {app_id} in {EVDIR}"
    parsed = {"stages": {}, "jobs": {}}
    for p in candidates:
        part = parse_eventlog(p)
        parsed["stages"].update(part["stages"])
        parsed["jobs"].update(part["jobs"])
    stages, jobs = parsed["stages"], parsed["jobs"]

    per_desc: dict[str, list[int]] = {}
    for jid, j in sorted(jobs.items()):
        per_desc.setdefault(j.get("desc") or "?", []).append(jid)
    for desc, jids in per_desc.items():
        if "#run" not in desc:
            continue
        total_wall = sum(
            (jobs[j].get("t1") or 0) - (jobs[j].get("t0") or 0) for j in jids
        )
        print(f"\n--- {desc}: {len(jids)} jobs, job-wall {total_wall} ms")
        for jid in jids:
            j = jobs[jid]
            jw = (j.get("t1") or 0) - (j.get("t0") or 0)
            executed = [s for s in j["stages"] if s in stages]
            print(f"  job {jid}: {jw} ms, stages {executed}")
            for sid in executed:
                st = stages[sid]
                nm = (st.get("name") or "").split("\n")[0][:90]
                print(
                    f"    stage {sid}: wall {st.get('wall_ms', 0)} ms, "
                    f"task-sum {st.get('task_ms', 0)} ms, "
                    f"gc {st.get('gc_ms', 0)} ms, "
                    f"tasks {st.get('n_tasks')}, "
                    f"in {st.get('input_b', 0) >> 10} KiB, "
                    f"shR {st.get('sh_read_b', 0) >> 10} KiB/"
                    f"{st.get('sh_read_rows', 0)}r, "
                    f"shW {st.get('sh_write_b', 0) >> 10} KiB/"
                    f"{st.get('sh_write_rows', 0)}r, "
                    f"fetch {st.get('fetch_ms', 0)} ms | {nm}"
                )


if __name__ == "__main__":
    main()
