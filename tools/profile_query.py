"""Per-JOB wall-time decomposition of one or more bench queries — the
guide-§1 attribution step the one-number bench can't give: how many
Spark jobs a query runs (driver round-trips: collects, index writes,
localCheckpoints, the final noop) and where the seconds land.

Usage:
    python tools/profile_query.py <query> [query ...]

Runs each query twice (warm JVM; the SECOND run is reported) with the
Spark UI enabled, then reads the UI REST API for per-job durations and
descriptions. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def make_session(cpus: str) -> SparkSession:
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def rest(spark: SparkSession, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = make_session(cpus)
    qs = entry.queries()
    # warm-up
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        for rep in range(2):
            before_jobs = {j["jobId"] for j in rest(spark, "jobs")}
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
            if rep == 0:
                continue
            jobs = [j for j in rest(spark, "jobs") if j["jobId"] not in before_jobs]
            jobs.sort(key=lambda j: j["jobId"])
            print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs (warm rep) ===")
            tsum = 0.0
            for j in jobs:
                t_start = j.get("submissionTime", "")
                t_end = j.get("completionTime", "")
                dur = ""
                try:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    d = (
                        datetime.strptime(t_end.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                        - datetime.strptime(t_start.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    ).total_seconds()
                    tsum += d
                    dur = f"{d:6.2f}s"
                except Exception:
                    dur = "?"
                desc = (j.get("description") or j.get("name") or "")[:100]
                print(
                    f"  job {j['jobId']:>4} {dur}  tasks={j.get('numTasks', '?'):>4}  {desc}"
                )
            print(f"  sum(job durations) {tsum:.2f}s vs wall {wall:.2f}s "
                  f"(gap = driver/py4j/plan time)")
    spark.stop()


if __name__ == "__main__":
    main()
