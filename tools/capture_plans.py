"""Capture .explain("formatted") for bench headline queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence the
judge reads instead of running Spark).

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]

e.g. `python tools/capture_plans.py r16 before` captures every bench
headline query; name queries explicitly to refresh a subset. Query
functions that run driver-side jobs at build time (bounded collects)
execute them here, so run this OUTSIDE any timed bench window.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = bench.make_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # pragma: no cover - capture helper
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
