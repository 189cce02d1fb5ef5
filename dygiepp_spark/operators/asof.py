"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Two implementations with identical semantics (tested equal):

- `asof_join`: composition of built-ins (pyspark_guide "Common OLAP
  patterns"): bounded equi+theta join on the partition key, then
  rank-1 window with a deterministic tie-break. Stays fully JVM-side;
  the tolerance bound keeps the intermediate join linear-ish instead
  of per-key quadratic — at web scale, ALWAYS pass a tolerance.
- `asof_join_pandas`: per-group `pd.merge_asof` via applyInPandas —
  the Arrow path for when the per-key history is long and sorted merge
  beats the join+rank (classic for market-data-style workloads).

Semantics: for each left row, the single right row with the largest
`right_ts <= left_ts` (strict=False) or `< left_ts` (strict=True),
within `tolerance_sec`, matching on `on`. Ties on right_ts broken by
the largest `right_id`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_id: str = "event_id",
              tolerance_sec: int | None = 3600,
              strict: bool = True) -> DataFrame:
    """Built-in composition. Output: all left columns + matched right
    columns prefixed `r_` (unmatched lefts dropped — inner as-of).

    The rank-1 window partitions on a synthetic per-row key, not the
    left columns: two fully identical left rows each keep their own
    match (same multiplicity contract as asof_join_pandas /
    pd.merge_asof), instead of silently collapsing to one.

    The per-row key is DETERMINISTIC: (digest of the left's groupable
    columns, ordinal within the digest group). monotonically_
    increasing_id() here would be recomputed with different values if
    a task retry or speculative re-execution re-ran the left subtree
    mid-query, duplicating or dropping matches; rows sharing a digest
    group still each get a unique (group, ordinal) key, and the as-of
    match depends only on each row's OWN `on`/`left_ts` values, so
    ordinal assignment within a group never changes the result set.
    Partitioning the two dup windows on the fixed-width xxhash64
    digest — not the raw columns — keeps the shuffle keys 8 bytes
    regardless of how wide the left's text/array payload is (the
    payload travels once as data, never again as key).

    Non-groupable column types (maps) are excluded from the digest.
    The dup windows partition on (digest, on, left_ts) — the raw `on`
    and `left_ts` columns ride along with the 8-byte digest (both
    fixed-width, always groupable), so even a 2^-64 digest collision
    between rows with DIFFERENT on/left_ts values cannot co-mingle
    their ordinals: rows sharing a partition are interchangeable in
    the only columns the as-of match reads, making ordinal assignment
    provably result-stable under task retry / recomputation."""
    from pyspark.sql import types as T

    def _groupable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _groupable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_groupable(f.dataType) for f in dt.fields)
        return True

    key_cols = [f.name for f in left.schema.fields
                if _groupable(f.dataType)]
    grp = (F.xxhash64(*[F.col(c) for c in key_cols])
           if key_cols else F.lit(0).cast("bigint"))
    w_dup = Window.partitionBy("_l_grp", on, left_ts).orderBy(F.lit(1))
    l = (left.withColumn("_l_grp", grp)
         .withColumn("_l_ord", F.row_number().over(w_dup))
         .alias("l"))
    r = right.alias("r")
    lts = F.col(f"l.{left_ts}")
    rts = F.col(f"r.{right_ts}")
    cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & \
           ((rts < lts) if strict else (rts <= lts))
    if tolerance_sec is not None:
        cond = cond & (rts >= lts - F.expr(
            f"INTERVAL {tolerance_sec} SECOND"))
    joined = l.join(r, cond)
    w = Window.partitionBy(
        F.col("l._l_grp"), F.col(f"l.{on}"), F.col(f"l.{left_ts}"),
        F.col("l._l_ord")) \
        .orderBy(rts.desc(), F.col(f"r.{right_id}").desc())
    out_cols = [F.col(f"l.{c}").alias(c) for c in left.columns] + \
               [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns]
    return (joined.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(*out_cols))


def asof_join_pandas(left: DataFrame, right: DataFrame, on: str,
                     left_ts: str = "ts", right_ts: str = "ts",
                     right_id: str = "event_id",
                     tolerance_sec: int | None = 3600,
                     strict: bool = True) -> DataFrame:
    """merge_asof path: cogroup both sides by key, sorted merge per
    group in Arrow batches."""
    l_cols = left.columns
    r_cols = right.columns
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in left.schema.fields] +
        [f"r_{f.name} {f.dataType.simpleString()}"
         for f in right.schema.fields])

    # Rename the right side before cogrouping: when both sides derive
    # from the same scan, Spark's attribute deduplication prunes the
    # right child down to the grouping key (shared expression ids);
    # distinct names force fresh attributes and keep all columns.
    right_rn = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in r_cols])

    tol = pd.Timedelta(seconds=tolerance_sec) \
        if tolerance_sec is not None else None

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        rpdf = rpdf.rename(
            columns={f"__r_{c}": c for c in r_cols})
        if len(lpdf) == 0:
            return pd.DataFrame(columns=l_cols + [f"r_{c}" for c in r_cols])
        # deterministic tie-break: keep the max right_id per right_ts
        rpdf = (rpdf.sort_values([right_ts, right_id])
                .groupby(right_ts, as_index=False).last()
                if len(rpdf) else rpdf)
        lpdf = lpdf.sort_values(left_ts)
        rpdf = rpdf.sort_values(right_ts) if len(rpdf) else rpdf
        merged = pd.merge_asof(
            lpdf, rpdf.rename(columns={c: f"r_{c}" for c in r_cols}),
            left_on=left_ts, right_on=f"r_{right_ts}",
            tolerance=tol, allow_exact_matches=not strict,
            direction="backward")
        merged = merged.dropna(subset=[f"r_{right_id}"])
        # merge_asof upcasts int columns to float when NaNs appear;
        # restore the right side's original dtypes post-filter
        for c in r_cols:
            dt = rpdf[c].dtype if c in rpdf else None
            if dt is not None and str(dt).startswith("int"):
                merged[f"r_{c}"] = merged[f"r_{c}"].astype(dt)
        return merged[l_cols + [f"r_{c}" for c in r_cols]]

    return (left.groupBy(on).cogroup(right_rn.groupBy(f"__r_{on}"))
            .applyInPandas(merge, out_schema))
