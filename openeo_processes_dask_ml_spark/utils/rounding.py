"""Cross-engine deterministic rounding.

Engines disagree on round() at half-boundaries: Spark rounds the
shortest decimal representation of the double (BigDecimal HALF_UP on
"68.865"), DuckDB rounds the binary value (68.86499... -> 68.86). Any
true value on an exact half flips between them.

``dround`` sidesteps the issue: floor(x * 10^k + 0.5) / 10^k is pure
IEEE-754 arithmetic, so identical inputs give bit-identical outputs in
every engine. The DuckDB twin is ``sql_round`` (emits the same
expression as SQL text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, k: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    m = float(10**k)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def sql_round(expr: str, k: int) -> str:
    m = float(10**k)
    return f"floor(({expr}) * {m} + 0.5) / {m}"
