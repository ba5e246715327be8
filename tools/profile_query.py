"""Empirical per-job/per-stage profile of a registry query (guide §1.1).

Runs the query once warm, then once instrumented, and prints a per-job
breakdown: job wall time, stage count, task count, shuffle read/write
bytes — the "where does the time actually go" view the Spark UI would
give, usable headlessly.

Usage:
    python tools/profile_query.py supplier_pagerank [--sf DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import bench

    spark = bench.build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from onetl_spark.showcase import all_queries

    queries = all_queries()
    fn = queries[args.query]

    # warm (JVM/codegen)
    bench.execute_fully(fn(spark, args.sf))
    spark.catalog.clearCache()

    # Status-tracker-based profile: snapshot job/stage info after the run.
    # Use a dedicated job group so only this run's jobs are counted
    # (CLAUDE.md: never delta the default job-group id list).
    group = f"profile-{args.query}"
    sc.setJobGroup(group, args.query)
    t0 = time.perf_counter()
    bench.execute_fully(fn(spark, args.sf))
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    spark.catalog.clearCache()

    tracker = sc.statusTracker()
    job_ids = sorted(tracker.getJobIdsForGroup(group))
    jvm_tracker = sc._jsc.sc().statusTracker()
    rows = []
    tot_stage_ms = 0
    tot_tasks = 0
    for jid in job_ids:
        jinfo = tracker.getJobInfo(jid)
        if jinfo is None:
            continue
        stage_ms = 0
        tasks = 0
        n_stages = 0
        for sid in jinfo.stageIds:
            opt = jvm_tracker.getStageInfo(sid)
            if not opt.isDefined():
                continue
            si = opt.get()
            if si.numCompletedTasks() == 0 and si.numTasks() == 0:
                continue
            n_stages += 1
            tasks += si.numTasks()
        rows.append({"job": jid, "stages": n_stages, "tasks": tasks})
        tot_tasks += tasks
    print(f"query={args.query} wall={wall:.3f}s jobs={len(job_ids)} tasks={tot_tasks}")
    # compact per-job line
    print(json.dumps(rows))

    # Also: REST-less stage timing via the AppStatusStore
    store = sc._jsc.sc().statusStore()
    try:
        empty = sc._jvm.java.util.Collections.emptyList()
        it = store.stageList(empty)
        n = it.size()
        stages = []
        for i in range(n):
            s = it.apply(i)
            try:
                dur = (s.completionTime().get().getTime() - s.submissionTime().get().getTime())
            except Exception:
                dur = -1
            stages.append(
                (
                    s.stageId(),
                    dur,
                    s.numTasks(),
                    s.shuffleReadBytes(),
                    s.shuffleWriteBytes(),
                    s.inputBytes(),
                    str(s.description() if hasattr(s, "description") else ""),
                )
            )
        stages.sort(key=lambda t: -t[1])
        print("top stages by duration (id, ms, tasks, shufRead, shufWrite, input):")
        for t in stages[:25]:
            print(f"  stage={t[0]} ms={t[1]} tasks={t[2]} sr={t[3]} sw={t[4]} in={t[5]}")
        tot_stage_ms = sum(max(t[1], 0) for t in stages)
        print(f"sum stage ms (whole session incl. warm) = {tot_stage_ms}")
    except Exception as e:  # noqa: BLE001
        print(f"statusStore introspection failed: {type(e).__name__}: {e}")

    spark.stop()


if __name__ == "__main__":
    main()
