"""Local simulation of the driver's correctness gate at an arbitrary SF.

Runs each queries() entry and its oracle_sql() twin side-by-side on the
same parquet tables, compares row count / column names / normalized
values, and prints one status line per query.  Usage:

    python tools/driver_sim.py [--strict] [--dump] [sf_dir] [first_n] [name ...]

Defaults: sf_dir=/root/testdata/sf0.01, first_n=50 (the driver's
verification window).  Naming specific queries overrides first_n.

--strict (VERDICT r7 #1): compare raw stringified rows the way the real
driver hashes them — every value str()-ified, md5 over the sorted rows,
NO float rounding / isclose leniency.  A query that is strict-green
here but red at the real gate is diverging on something environmental
(engine-version rendering, session state), not on values.
--dump: print both engines' normalized rows for each compared query.
"""

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

STRICT = False
DUMP = False


def normalize(rows, columns):
    # NOTE: rows are aligned by sorting on stringified rounded values —
    # intentionally ORDER-STRICT, because the real driver md5-hashes the
    # sorted rows: a float that rounds differently across engines would
    # fail the real gate too, and this sim must mirror that.
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 9)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [columns[i] for i in order], out


def strict_normalize(rows, columns):
    """Raw stringified rows, the way the real driver hashes them: sort
    columns by name, str() every value (datetimes via isoformat for
    cross-engine type parity), sort rows lexically — no float rounding,
    no isclose. The md5 of this list IS the driver's value hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in order], out


def strict_hash(rows):
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:12]


def dump_rows(label, cols, rows, limit=20):
    print(f"  --- {label} ({len(rows)} rows) cols={cols}")
    for r in rows[:limit]:
        print(f"    {r}")
    if len(rows) > limit:
        print(f"    ... {len(rows) - limit} more")


def compare(spark, con, name, fn, sql):
    qdf = fn(spark, SF_DIR)
    s_raw = [tuple(r) for r in qdf.collect()]
    s_cols, s_rows = normalize(s_raw, qdf.columns)
    if sql is None:
        return f"rows-only ({len(s_rows)} rows)"
    res = con.execute(sql)
    d_raw = res.fetchall()
    d_desc = [d[0] for d in res.description]
    d_cols, d_rows = normalize(d_raw, d_desc)
    if DUMP:
        dump_rows("spark", s_cols, s_rows)
        dump_rows("duckdb", d_cols, d_rows)
    if s_cols != d_cols:
        return f"FAIL cols spark={s_cols} duck={d_cols}"
    if len(s_rows) != len(d_rows):
        return f"FAIL rows spark={len(s_rows)} duck={len(d_rows)}"
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                if not math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9):
                    return f"FAIL value row{i} {c}: {sv} != {dv}"
            elif sv != dv:
                return f"FAIL value row{i} {c}: {sv!r} != {dv!r}"
    if STRICT:
        # typed-slot contract (r12, the dsir n_grams lesson): a DuckDB
        # output cell of SCALE-0 Decimal type means a bare sum() of an
        # integer reached the SELECT — fetchall() str()s Decimal('29')
        # to "29" (green here) but a pandas-side fetch renders float64
        # "29.0" (red at the real driver). Fail loudly instead of
        # passing greenly. Fractional-scale decimals are safe: both
        # fetch paths render Decimal('3.5') as "3.5" (the r10/r11
        # driver-green raster gates carry DECIMAL(_, 1) y columns).
        import decimal

        for row in d_raw:
            for c, v in zip(d_desc, row):
                if (
                    isinstance(v, decimal.Decimal)
                    and v.as_tuple().exponent >= 0
                ):
                    return (
                        f"STRICT-FAIL scale-0 decimal column {c!r}: "
                        "CAST the aggregate to BIGINT in the oracle"
                    )
        _, ss = strict_normalize(s_raw, list(qdf.columns))
        _, ds = strict_normalize(d_raw, d_desc)
        sh, dh = strict_hash(ss), strict_hash(ds)
        if sh != dh:
            mism = next(
                (f"row{i} {a} != {b}" for i, (a, b) in enumerate(zip(ss, ds)) if a != b),
                "row-set diff",
            )
            return f"STRICT-FAIL hash {sh}!={dh}: {mism}"
        return f"ok+strict ({len(s_rows)} rows, hash {sh})"
    return f"ok ({len(s_rows)} rows)"


if __name__ == "__main__":
    args = sys.argv[1:]
    STRICT = "--strict" in args
    DUMP = "--dump" in args
    args = [a for a in args if not a.startswith("--")]
    SF_DIR = args[0] if args else "/root/testdata/sf0.01"
    first_n = int(args[1]) if len(args) > 1 else 50
    names = args[2:]

    from openeo_processes_dask_ml_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry.queries()
    osql = entry.oracle_sql()
    todo = names or list(qs)[:first_n]
    failures = 0
    for name in todo:
        t0 = time.time()
        try:
            status = compare(spark, con, name, qs[name], osql.get(name))
        except Exception as e:  # noqa: BLE001
            status = f"ERROR {type(e).__name__}: {e}"
        dt = time.time() - t0
        if not status.startswith(("ok", "rows-only")):
            failures += 1
        print(f"{name:32s} {status}  [{dt:.1f}s]", flush=True)
    print(f"done: {len(todo)} queries, {failures} failures")
    sys.exit(1 if failures else 0)
