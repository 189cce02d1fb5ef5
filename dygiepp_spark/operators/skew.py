"""Explicit skew handling: salted aggregation + salted join.

SURVEY.md §4.3 / north_rule: "partitioning / shuffle / skew handled
explicitly". AQE skew-join splitting is left ON as the backstop
(plans/session.py); these utilities are for the cases AQE cannot fix:

- `salted_aggregate`: a groupBy whose key distribution is pathological
  (one key holds a large fraction of all rows — e.g. counting mentions
  per surface form when one boilerplate string dominates a crawl).
  Two-phase: aggregate on (key, salt) — partial state spreads over
  `n_salts` reducers — then merge the per-salt partials. Works for any
  algebraic aggregate (sum/count/min/max).
- `salted_broadcast_left`: replicate-broadcast join for a skewed
  many-to-one join where the dimension is small enough to broadcast;
  the salt spreads the FACT side, the dim side is replicated per salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, key_cols: list[str],
                     aggs: dict[str, str],
                     n_salts: int = 32) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {column: fn} with fn in {sum, count, min, max}. count is
    emitted as sum of partial counts. Result columns keep the input
    names (count uses 'n_<col>').
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for col, fn in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"n_{col}"))
            final_exprs.append(F.sum(f"n_{col}").cast("bigint")
                               .alias(f"n_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(col))
            final_exprs.append(F.sum(col).alias(col))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(col))
            final_exprs.append(F.min(col).alias(col))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(col))
            final_exprs.append(F.max(col).alias(col))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame,
                          key: str, n_salts: int = 16) -> DataFrame:
    """Skew-safe many-to-one join: fact rows get a random salt, the
    (small) dim is exploded across all salts and broadcast, and the
    join key becomes (key, salt) — a hot fact key now lands on
    n_salts reducers instead of one. Equivalent rows to
    fact.join(dim, key, 'left')."""
    f_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)))
    d_s = (dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
        .withColumn("_salt", F.col("_salt").cast("bigint")))
    return (f_s.join(F.broadcast(d_s), [key, "_salt"], "left")
            .drop("_salt"))
