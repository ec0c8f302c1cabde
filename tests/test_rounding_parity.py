"""Property test for the cross-engine rounding primitive: the dround
formula evaluated in Python (IEEE-754 doubles, same as Spark codegen)
must agree with DuckDB's evaluation of the identical SQL expression for
arbitrary doubles — including values adjacent to half-boundaries where
engine-native round() disagrees."""

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


def py_dround(x: float, k: int) -> float:
    m = float(10**k)
    return math.floor(x * m + 0.5) / m


@settings(max_examples=300, deadline=None)
@given(
    x=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    k=st.integers(min_value=0, max_value=6),
)
def test_dround_matches_duckdb(x, k):
    m = float(10**k)
    con = duckdb.connect()
    (got,) = con.execute(
        f"SELECT floor(CAST(? AS DOUBLE) * {m} + 0.5) / {m}", [x]
    ).fetchone()
    con.close()
    expected = py_dround(x, k)
    assert got == expected, (x, k, got, expected)


def test_native_round_would_disagree():
    """Regression documentation: the exact case that broke parity —
    value on a half-boundary after arithmetic. Engines disagree on
    round(); dround is deterministic."""
    x = (147.73 - 10.0) / 2.0  # 68.865 in decimal, 68.86499... in binary
    con = duckdb.connect()
    (duck_round,) = con.execute("SELECT round(CAST(? AS DOUBLE), 2)", [x]).fetchone()
    con.close()
    # DuckDB rounds the binary value down; Spark's BigDecimal of the
    # shortest repr rounds up — dround picks one behavior everywhere
    assert duck_round == 68.86
    assert py_dround(x, 2) == 68.86
