"""Dev-only A/B runner: time a subset of bench queries in one fresh
session and append one JSON line {tag, queries:{name: min_sec}} to the
output file. Used with alternating `git stash` states to compare two
code versions under identical ambient conditions.

Usage: python tools/ab_bench.py <tag> <out.jsonl> <reps> <query> [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    tag, out, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.make_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    qs = entry.queries()
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    times: dict[str, list] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[n].append(time.time() - t0)
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(False)
    spark.stop()
    rec = {
        "tag": tag,
        "queries": {n: round(min(ts), 3) for n, ts in times.items()},
        "total": round(sum(min(ts) for ts in times.values()), 3),
    }
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
