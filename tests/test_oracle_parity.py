"""Mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() twin must match DuckDB on row count, column names, and
values (order-insensitive) at sf0.001."""

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
REPO = Path(__file__).resolve().parent.parent
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name, stringify dates/times, round-trip floats."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [columns[i] for i in order], out


ORACLES = entry.oracle_sql()
QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    spark_cols = qdf.columns

    con = duck_connection()
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    s_cols, s_rows = normalize(spark_rows, spark_cols)
    d_cols, d_rows = normalize(duck_rows, duck_cols)

    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}\n"
        f"spark sample: {s_rows[:3]}\nduck sample: {d_rows[:3]}"
    )
    mismatches = []
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                if not math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9):
                    mismatches.append((i, c, sv, dv))
            elif sv != dv:
                mismatches.append((i, c, sv, dv))
        if len(mismatches) > 5:
            break
    assert not mismatches, f"value mismatches (row, col, spark, duck): {mismatches[:5]}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_entry_surface_consistency():
    """Driver-contract invariants: every bench HEADLINE name resolves to
    a queries() entry, every oracle_sql key has a query, no duplicate
    query keys, and the rows-only set is exactly the documented one."""
    import importlib

    bench = importlib.import_module("bench")
    entry = importlib.import_module("__spark_entry__")

    qs = entry.queries()
    osql = entry.oracle_sql()
    missing_bench = [n for n in bench.HEADLINE if n not in qs]
    assert missing_bench == [], missing_bench
    orphans = [n for n in osql if n not in qs]
    assert orphans == [], orphans
    rows_only = sorted(n for n in qs if n not in osql)
    # VERDICT r8 #4: zero rows-only queries — bpe_merges and
    # ann_ivf_trained now carry full iterative SQL replays (unrolled
    # materialized CTE stages; deterministic Lloyd trainer)
    assert rows_only == [], rows_only


def test_driver_window_composition_pinned():
    """The first 50 queries() entries ARE the driver's verification
    window. Instead of a hard-coded name list (which went stale when
    the r15 closing rotation commit reordered queries() without
    updating it — the one pytest failure of that round), this derives
    the pin from the rotation protocol's artifacts:

    - ``tools/driver_window.json`` is the manifest the rotation tool
      (``tools/rotate_window.py``) writes in the SAME operation that
      reorders ``QUERY_ORDER`` — dict and manifest cannot drift.
    - the manifest's ``changed`` set must lead the window (their first
      driver check covers the new semantics);
    - if the manifest's round already has a committed CORRECTNESS
      file, its keys must be exactly the current window (the driver
      checked what we think it checked).
    """
    import importlib
    import glob
    import json
    import re

    entry = importlib.import_module("__spark_entry__")
    order = list(entry.queries().keys())
    assert order == entry.QUERY_ORDER, "queries() must derive from QUERY_ORDER"
    assert len(set(order)) == len(order), "duplicate query names"
    window = order[:50]

    manifest = json.loads((REPO / "tools" / "driver_window.json").read_text())
    changed = manifest["changed"]
    assert len(changed) <= 50
    assert window == manifest["window"], (
        "QUERY_ORDER window drifted from tools/driver_window.json — "
        "rotate with tools/rotate_window.py, never by hand"
    )
    assert window[: len(changed)] == changed, "changed queries must lead the window"

    # Post-driver consistency: once the driver has recorded this
    # round's CORRECTNESS file, its keys are exactly the window.
    rounds = {
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1)): p
        for p in glob.glob(str(REPO / "CORRECTNESS_r*.json"))
    }
    this_round = rounds.get(manifest["round"])
    if this_round:
        recorded = set(json.loads(open(this_round).read()))
        assert recorded == set(window), (
            "the committed CORRECTNESS file for this round does not match "
            "the current window — rotation happened after the driver ran"
        )

    # Rotation-freshness: nothing outside the window may be MORE stale
    # than the fill portion of the window. "Staleness" = last round a
    # query appeared in a committed CORRECTNESS file, taken over rounds
    # BEFORE the manifest round (the manifest round's own file records
    # this very window). Changed queries are exempt (they jump the
    # queue); never-checked queries count as round 0.
    last_green: dict[str, int] = {}
    for r, p in sorted(rounds.items()):
        if r >= manifest["round"]:
            continue
        for k in json.loads(open(p).read()):
            last_green[k] = r
    fill = [n for n in window if n not in changed]
    # queries with NO green history are exempt from the staleness
    # comparison: they are this round's additions, appended to the
    # tail until the next rotation puts them (as changed) at the
    # front — counting them as "stale since r0" made the pin test go
    # red the moment a new gate landed mid-round (r16 review).
    outside = [
        n
        for n in order[50:]
        if n not in changed and last_green.get(n, 0) > 0
    ]
    if fill and outside:
        newest_fill = max(last_green.get(n, 0) for n in fill)
        stalest_out = min(last_green.get(n, 0) for n in outside)
        # Queue-order is the protocol's source of truth; CORRECTNESS
        # ages can straddle one round because a cohort may split
        # across windows. More than one round of inversion means the
        # rotation skipped genuinely stale queries.
        assert newest_fill - stalest_out <= 2, (
            f"window fill (newest green r{newest_fill}) skipped queries "
            f"outside the window stale since r{stalest_out}"
        )
