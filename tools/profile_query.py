#!/usr/bin/env python3
"""Profile one or more benched queries: per-job / per-stage wall clock.

Usage:
    python tools/profile_query.py <query> [<query> ...]

Runs each query once warm (construction + noop execution), then times a
second full construction+execution pass with the Spark UI enabled and
dumps the job/stage breakdown from the status tracker REST API.  Prints,
per query:

  - construction time (driver-side plan building, incl. any fits/counts
    the query body performs)
  - execution time (noop sink)
  - every job with its description, duration, and stage task-time totals

The bench must NOT be running concurrently (timings share the machine).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from soccer_data_pipeline_spark.plans import QUERIES
    from soccer_data_pipeline_spark.session import get_spark
    from soccer_data_pipeline_spark.operators.cache import release_session_blocks

    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.loads(r.read())

    # JVM+codegen warm
    heavy = QUERIES.get("flagship_top_customers")
    if heavy is not None:
        heavy.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_session_blocks(spark, gc=True)

    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"== {name}: NOT REGISTERED")
            continue
        # warm pass (codegen, caches the query body may populate)
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"== {name}: FAILED {type(exc).__name__}: {exc}")
            continue
        release_session_blocks(spark, gc=True)

        jobs_before = {j["jobId"] for j in rest("/jobs")}
        sc.setJobDescription(f"{name}: construction")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        t1 = time.perf_counter()
        sc.setJobDescription(f"{name}: execution")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobDescription(None)

        print(f"== {name}: construct {t1-t0:.3f}s  execute {t2-t1:.3f}s  total {t2-t0:.3f}s")
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        for j in jobs:
            sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            try:
                comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                dur = time.mktime(comp) - time.mktime(sub)
            except KeyError:
                dur = -1
            desc = (j.get("description") or j["name"])[:90]
            print(
                f"   job {j['jobId']:>4} {dur:5.0f}s tasks={j['numCompletedTasks']:>4} "
                f"stages={len(j['stageIds'])} {desc}"
            )
        release_session_blocks(spark, gc=True)

    spark.stop()


if __name__ == "__main__":
    main()
