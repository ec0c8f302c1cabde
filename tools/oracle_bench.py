"""Time the DuckDB oracle suite against the Spark bench record.

The de-facto performance baseline (BASELINE.md publishes no reference
numbers) is the DuckDB oracle suite on identical parquet at the same
SF. This tool makes the comparison reproducible instead of ad hoc:
it times every HEADLINE query's oracle_sql() in DuckDB (32 threads,
single rep — DuckDB has no JIT warmup to amortize) and joins the
result against the Spark minima in BENCH_SELF.json (written by
bench.py, min-of-3).

Usage:
    python bench.py                 # writes BENCH_SELF.json
    python tools/oracle_bench.py    # prints the matched-set ratio

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import __spark_entry__ as entry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    bench_src = open(os.path.join(repo, "bench.py")).read()
    headline = re.findall(
        r'"([^"]+)"', re.search(r"HEADLINE = \[(.*?)\]", bench_src, re.S).group(1)
    )
    sql = entry.oracle_sql()
    matched = [n for n in headline if n in sql]

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    duck: dict[str, float] = {}
    for name in matched:
        t0 = time.time()
        con.execute(sql[name]).fetchall()
        duck[name] = round(time.time() - t0, 3)
    duck_total = round(sum(duck.values()), 1)

    spark_q = json.load(open(os.path.join(repo, "BENCH_SELF.json")))["queries"]
    spark_total = round(sum(v for k, v in spark_q.items() if k in matched), 1)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "matched": len(matched),
                "headline": len(headline),
                "spark_sec": spark_total,
                "duckdb_sec": duck_total,
                "ratio": round(spark_total / duck_total, 2),
                "duckdb_top5": dict(
                    sorted(duck.items(), key=lambda kv: -kv[1])[:5]
                ),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
