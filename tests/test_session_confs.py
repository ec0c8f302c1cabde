"""Session-conf hygiene (VERDICT r7 #3).

The conf-leak failure class: a query body sets reader confs inline,
another query inherits a DIFFERENT state from its predecessor. Fixed by
hoisting every site onto ONE helper (io/load.py:_PINNED_SESSION_CONFS),
so the post-query session state is always the same documented fixed
point, plus a scoped context manager for applications that need their
own timezone restored.
"""

import re

from openeo_processes_dask_ml_spark.io.load import (
    _PINNED_SESSION_CONFS,
    pin_session_confs,
    session_confs_pinned,
)

SF_DIR = "/root/testdata/sf0.001"


def test_no_bare_conf_set_in_query_bodies():
    """The gate surface and the streaming runners must route every
    session-conf write through the shared helper — a bare conf.set in a
    query body is the drift-prone shape VERDICT r7 #3 bans."""
    for path in (
        "/root/repo/__spark_entry__.py",
        "/root/repo/openeo_processes_dask_ml_spark/streaming/rollup.py",
    ):
        src = open(path).read()
        # strings inside comments/docstrings mentioning the pattern are
        # fine; actual call sites are not
        calls = [
            ln
            for ln in src.splitlines()
            if re.search(r"spark\.conf\.set\(", ln)
            and not ln.lstrip().startswith("#")
        ]
        assert calls == [], f"bare spark.conf.set in {path}: {calls}"


def test_context_manager_restores_prior_values(spark):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    with session_confs_pinned(spark):
        for k, v in _PINNED_SESSION_CONFS.items():
            assert spark.conf.get(k) == v
    assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    # leave the session in the pinned state for the rest of the suite
    pin_session_confs(spark)


def test_query_run_leaves_pinned_fixed_point(spark):
    """Running an engine query leaves the session exactly in the pinned
    state — the fixed point every query asserts on entry, so no query
    can observe a predecessor-dependent session. (Pin-without-restore
    is deliberate for the query surface: LTZ timestamps in returned
    DataFrames render under the session tz AT COLLECT TIME, so a
    restore to a non-UTC ambient zone would shift results collected
    after the query function returns — see io/load.py.)"""
    import __spark_entry__ as entry

    out = entry.queries()["streaming_rollup"](spark, SF_DIR)
    out.collect()
    for k, v in _PINNED_SESSION_CONFS.items():
        assert spark.conf.get(k) == v
    # and a second, batch query observes the identical state
    entry.queries()["tpch_q1"](spark, SF_DIR).collect()
    for k, v in _PINNED_SESSION_CONFS.items():
        assert spark.conf.get(k) == v
