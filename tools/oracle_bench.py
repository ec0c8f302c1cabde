"""Paired Spark-vs-DuckDB timing for the headline suite.

The de-facto performance baseline (BASELINE.md publishes no reference
numbers) is the DuckDB oracle suite on identical parquet at the same
SF. Earlier rounds timed the two engines in SEPARATE passes, so
co-tenant CPU bursts landed on one engine only and same-code ratio
samples spanned 0.97-1.41x (VERDICT r15 #2). This harness removes
that failure mode: within each rep every query's Spark run and DuckDB
run are timed back-to-back — ambient load hits both engines of a pair
near-identically — reps are interleaved round-robin across queries
(the r13 decision), the per-query stat is min-over-reps for both
engines, and the record reports the PAIRED per-query ratios plus the
per-rep total-ratio spread as the noise gauge.

Usage:
    python tools/oracle_bench.py            # paired run, prints ratio
    python tools/oracle_bench.py --from-bench-self
        # legacy: no Spark session; joins a DuckDB-only pass against
        # the Spark minima already recorded in BENCH_SELF.json

Writes the full paired record to ORACLE_BENCH.json next to
BENCH_SELF.json. Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_REPS (default 3).
"""

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str, threads: int):
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def record(sf_dir, matched, headline, spark_q, duck_q, extra=None):
    spark_total = round(sum(spark_q[n] for n in matched), 1)
    duck_total = round(sum(duck_q[n] for n in matched), 1)
    doc = {
        "sf_dir": sf_dir,
        "matched": len(matched),
        "headline": len(headline),
        "spark_sec": spark_total,
        "duckdb_sec": duck_total,
        "ratio": round(spark_total / duck_total, 2),
        "duckdb_top5": dict(
            sorted(
                ((n, duck_q[n]) for n in matched), key=lambda kv: -kv[1]
            )[:5]
        ),
    }
    if extra:
        doc.update(extra)
    return doc


def legacy_main(sf_dir: str, matched, headline, sql) -> None:
    """DuckDB-only pass joined against BENCH_SELF.json (the pre-r16
    two-pass measurement — kept for quick oracle-side-only checks)."""
    con = duck_connect(sf_dir, 32)
    duck: dict[str, float] = {}
    for name in matched:
        t0 = time.time()
        con.execute(sql[name]).fetchall()
        duck[name] = round(time.time() - t0, 3)
    spark_q = json.load(open(os.path.join(REPO, "BENCH_SELF.json")))["queries"]
    print(json.dumps(
        record(sf_dir, matched, headline, spark_q, duck, {"mode": "two-pass"}),
        indent=2,
    ))


def main() -> None:
    import bench
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sql = entry.oracle_sql()
    headline = bench.HEADLINE
    matched = [n for n in headline if n in sql]

    if "--from-bench-self" in sys.argv:
        legacy_main(sf_dir, matched, headline, sql)
        return

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = bench.make_session(cpus)
    con = duck_connect(sf_dir, int(cpus))
    qs = entry.queries()

    # warm up BOTH engines (JVM/codegen + parquet footers; DuckDB's
    # first query pays the view bind + buffer-pool fill)
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    con.execute(sql["tpch_q1"]).fetchall()

    # reps are QUERY-LOCAL (S,D,S,D,... within seconds of each other,
    # r16): ambient load drifts on ~minutes timescales, so running all
    # of a query's reps adjacently makes every Spark/DuckDB pair — and
    # therefore every per-rep total — share the same load phase. The
    # earlier whole-pass rep loop left ~20 minutes between a query's
    # reps, which re-introduced exactly the phase drift pairing was
    # meant to cancel (first paired run: warm rep ratios 1.31/1.07).
    s_times: dict[str, list] = {n: [] for n in matched}
    d_times: dict[str, list] = {n: [] for n in matched}
    for name in matched:
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t1 = time.time()
            con.execute(sql[name]).fetchall()
            t2 = time.time()
            s_times[name].append(t1 - t0)
            d_times[name].append(t2 - t1)
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            rdd.unpersist(False)
    rep_ratio = [
        round(
            sum(s_times[n][i] for n in matched)
            / sum(d_times[n][i] for n in matched),
            3,
        )
        for i in range(reps)
    ]

    spark_q = {n: round(min(ts), 3) for n, ts in s_times.items()}
    duck_q = {n: round(min(ts), 3) for n, ts in d_times.items()}
    pair_ratio = {
        n: round(spark_q[n] / duck_q[n], 2) if duck_q[n] > 0 else None
        for n in matched
    }
    extra = {
        "mode": "paired",
        "reps": reps,
        # per-rep total ratio: each rep is one contiguous pass where
        # every pair shared ambient load. Rep 1 is systematically
        # Spark-biased (every query's FIRST run pays whole-stage
        # codegen; DuckDB has no JIT), so the warm spread — over reps
        # 2..n, whose remaining variation is ambient phase drift
        # between ~20-minute passes — is the honest noise gauge.
        "rep_ratios": rep_ratio,
        "ratio_spread": round(max(rep_ratio) - min(rep_ratio), 3),
        "warm_ratio_spread": round(
            max(rep_ratio[1:]) - min(rep_ratio[1:]), 3
        )
        if len(rep_ratio) > 1
        else 0.0,
        "pair_ratio_top5": dict(
            sorted(
                ((n, r) for n, r in pair_ratio.items() if r is not None),
                key=lambda kv: -kv[1],
            )[:5]
        ),
    }
    doc = record(sf_dir, matched, headline, spark_q, duck_q, extra)
    full = dict(doc)
    full["spark_queries"] = spark_q
    full["duckdb_queries"] = duck_q
    full["pair_ratios"] = pair_ratio
    with open(os.path.join(REPO, "ORACLE_BENCH.json"), "w") as f:
        json.dump(full, f, separators=(",", ":"))
        f.write("\n")
    spark.stop()
    print(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
