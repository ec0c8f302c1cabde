"""Skew mitigation helpers: salted aggregation and salted broadcast
join for hot keys.

AQE's skew-join handling splits oversized SHUFFLE partitions, but two
shapes still hurt at 100 TB:

- a groupBy where one key holds a large share of all rows (partial
  aggregation helps only when the map-side combine ratio is high —
  e.g. collect_list/percentile state doesn't combine down), and
- a shuffle join where one build-side key explodes a single task.

``salted_groupby`` spreads each hot group over ``n_salts`` synthetic
sub-keys and merges the sub-aggregates in a second (tiny) aggregation:
two shuffles, but the first one is balanced. Correct only for
MERGEABLE aggregates (sum/count/min/max + anything with an explicit
merge step).

``replicate_broadcast_join`` handles the join side: the small table is
replicated ``n_salts`` times (one copy per salt), the big side tags
rows with ``pmod(hash, n_salts)``, and the equi-join key becomes
(key, salt) — each hot key now lands in ``n_salts`` tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform per-row salt in [0, n_salts) — cheap, no RNG state
    (monotonically_increasing_id is partition-local and dense enough
    for load balancing)."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``partial_aggs`` aggregate within (keys..., salt); ``merge_aggs``
    combine the partial columns per keys. E.g. for a skewed count:
    partial ``count(*) as c`` then merge ``sum(c) as c``.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def replicate_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the big side, replicate the small side per
    salt, join on (keys..., salt). The small side stays broadcast-sized
    (x n_salts); every hot key spreads over n_salts tasks."""
    big_s = with_salt(big, n_salts)
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("__salt")
    small_r = small.select("*", salts)
    out = big_s.join(F.broadcast(small_r), [*on, "__salt"], how)
    return out.drop("__salt")
