"""SQL-twinned operator queries over the TPC-H-ish driver tables.

Each query is the relational analog of a reference computation
(SURVEY.md §2 row cited per query) implemented with idiomatic
DataFrame API — broadcast hints for dimensions, window functions with
deterministic tie-breaks, anti/semi joins — plus a DuckDB oracle twin.

Numeric discipline (driver hashes values): counts CAST to BIGINT,
float aggregates ROUNDed, row_number CAST to INT, identically on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dygiepp_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- A1
@register("q_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                           AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                                AS avg_qty,
       ROUND(AVG(l_discount), 4)                                AS avg_disc,
       CAST(COUNT(*) AS BIGINT)                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 metric-accumulation analog (ref:dygie/training/f1.py::
    compute_f1 — partial+final hash agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count(F.lit(1)).cast("bigint").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


# ---------------------------------------------------------------- W1
@register("q_topk_per_user", sql="""
SELECT user_id, event_id, ROUND(value, 2) AS value, rn FROM (
  SELECT user_id, event_id, value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY value DESC, event_id ASC) AS INT) AS rn
  FROM events) WHERE rn <= 3
ORDER BY user_id, rn
""")
def q_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 span-pruning-beam analog (ref:dygie/models/
    entity_beam_pruner.py::Pruner): per-group top-k with the mandatory
    deterministic tie-break (score desc, id asc)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(),
                                              F.col("event_id").asc())
    return (ev.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter(F.col("rn") <= 3)
            .select("user_id", "event_id",
                    F.round("value", 2).alias("value"), "rn")
            .orderBy("user_id", "rn"))


# ---------------------------------------------------------------- J6 + joins
@register("q_region_revenue", sql="""
SELECT r.r_name AS region_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY r.r_name
""")
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 dimension-lookup chain (broadcast joins — the Vocabulary
    broadcast-dict analog, SURVEY.md §2.3). Small dims explicitly
    broadcast so the fact table never shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count(F.lit(1)).cast("bigint").alias("n_items"))
            .orderBy("region_name"))


# ---------------------------------------------------------------- J4 anti/semi
@register("q_customers_no_orders", sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
""")
def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 FN-side analog: gold − pred via LEFT ANTI join
    (ref:dygie/training/ner_metrics.py false-negative accounting)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name").orderBy("c_custkey"))


@register("q_active_customers", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_active FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def q_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 TP-side analog via LEFT SEMI join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_active")))


# ---------------------------------------------------------------- U1/U2
@register("q_union_kinds", sql="""
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT 'high_value' AS kind, event_id FROM events WHERE value > 150
  UNION ALL
  SELECT 'signup' AS kind, event_id FROM events WHERE event_type = 'signup'
) GROUP BY kind ORDER BY kind
""")
def q_union_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 triple-stream union analog (entity ∪ relation ∪ event
    triples, SURVEY.md §2.6) via unionByName."""
    ev = _t(spark, sf_dir, "events")
    a = (ev.filter(F.col("value") > 150)
         .select(F.lit("high_value").alias("kind"), "event_id"))
    b = (ev.filter(F.col("event_type") == "signup")
         .select(F.lit("signup").alias("kind"), "event_id"))
    return (a.unionByName(b).groupBy("kind")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .orderBy("kind"))


@register("q_intersect_custkeys", sql="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM (
  SELECT c_custkey AS k FROM customer
  INTERSECT
  SELECT o_custkey AS k FROM orders
)
""")
def q_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 eval-intersect analog (TP = pred ∩ gold)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return (c.intersect(o)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_common")))


# ---------------------------------------------------------------- J3 range join
@register("q_recent_prior_events", sql="""
SELECT a.event_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_prior
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts < a.ts
 AND b.ts >= a.ts - INTERVAL 5 MINUTE
GROUP BY a.event_id ORDER BY a.event_id
""")
def q_recent_prior_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 coref-antecedent range join (ref:dygie/models/coref.py::
    CorefResolver — span i vs earlier spans within window K): equi on
    the partition key + bounded theta predicate. AQE handles the skew
    if one user is hot."""
    ev = _t(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("b.ts") < F.col("a.ts"))
                   & (F.col("b.ts") >=
                      F.col("a.ts") - F.expr("INTERVAL 5 MINUTE")))
            .groupBy(F.col("a.event_id").alias("event_id"))
            .agg(F.count(F.col("b.event_id")).cast("bigint")
                 .alias("n_prior"))
            .orderBy("event_id"))


# ---------------------------------------------------------------- A4/W5
@register("q_user_activity", sql="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id ORDER BY user_id
""")
def q_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 cluster-aggregation analog (groupBy entity -> member stats)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value"),
                 F.countDistinct("event_type").cast("bigint")
                 .alias("n_types"))
            .orderBy("user_id"))


@register("q_rollup_flags", sql="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""")
def q_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 grouping-sets/rollup (no reference counterpart — SURVEY.md
    §2.4 notes built-ins; included for engine completeness)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.coalesce("l_returnflag", F.lit("ALL"))
                    .alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL"))
                    .alias("linestatus"), "n")
            .orderBy("returnflag", "linestatus"))


# ---------------------------------------------------------------- sessionize
@register("q_sessionize", sql="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id ORDER BY user_id
""")
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap flag (pyspark_guide 'Common OLAP
    patterns'); the batch form of session windows — the reference has
    no streaming counterpart (SURVEY.md §2.10)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    return (ev.withColumn(
                "new_sess",
                F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
            .groupBy("user_id")
            .agg(F.sum("new_sess").cast("bigint").alias("n_sessions"),
                 F.count(F.lit(1)).cast("bigint").alias("n_events"))
            .orderBy("user_id"))


# ---------------------------------------------------------------- pivot
@register("q_pivot_flags", sql="""
SELECT l_returnflag,
       CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_open,
       CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_filled,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2)
           AS qty_open,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2)
           AS qty_filled
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def q_pivot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation — the dialect-portable form of
    df.groupBy().pivot() (identical plan shape: single hash agg)."""
    li = _t(spark, sf_dir, "lineitem")
    is_o = F.col("l_linestatus") == "O"
    is_f = F.col("l_linestatus") == "F"
    return (li.groupBy("l_returnflag")
            .agg(F.count(F.when(is_o, 1)).cast("bigint").alias("n_open"),
                 F.count(F.when(is_f, 1)).cast("bigint").alias("n_filled"),
                 F.round(F.sum(F.when(is_o, F.col("l_quantity"))
                               .otherwise(0.0)), 2).alias("qty_open"),
                 F.round(F.sum(F.when(is_f, F.col("l_quantity"))
                               .otherwise(0.0)), 2).alias("qty_filled"))
            .orderBy("l_returnflag"))


# ------------------------------------------------------- running window
@register("q_running_value", sql="""
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_value,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS INT) AS seq
FROM events QUALIFY seq <= 20 ORDER BY user_id, seq
""")
def q_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window (W5 family): deterministic frame
    (ts, event_id tie-break), truncated per user for stable output."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    return (ev.withColumn(
                "running_value",
                F.round(F.sum("value").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)), 2))
            .withColumn("seq", F.row_number().over(w).cast("int"))
            .filter(F.col("seq") <= 20)
            .select("user_id", "event_id", "running_value", "seq")
            .orderBy("user_id", "seq"))


# ------------------------------------------------------------ lag delta
@register("q_event_gaps", sql="""
WITH g AS (
  SELECT user_id, event_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT)
         - CAST(FLOOR(epoch(LAG(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
             AS gap_sec
  FROM events)
SELECT user_id,
       CAST(COUNT(gap_sec) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_sec) AS BIGINT) AS min_gap,
       CAST(MAX(gap_sec) AS BIGINT) AS max_gap
FROM g GROUP BY user_id ORDER BY user_id
""")
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event deltas + per-user gap stats."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = (epoch - F.lag(epoch).over(w)).cast("bigint")
    return (ev.withColumn("gap_sec", gap)
            .groupBy("user_id")
            .agg(F.count("gap_sec").cast("bigint").alias("n_gaps"),
                 F.min("gap_sec").cast("bigint").alias("min_gap"),
                 F.max("gap_sec").cast("bigint").alias("max_gap"))
            .orderBy("user_id"))


@register("q_event_windows", sql="""
SELECT CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT) AS win_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""")
def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (F.window) — the batch twin of the
    streaming windowed aggregation (streaming/windows.py): same
    30-minute buckets, window start surfaced as epoch seconds."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window(F.col("ts"), "30 minutes").alias("win"),
                       "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.unix_timestamp(
                F.col("win.start").cast("timestamp"))
                .cast("bigint").alias("win_start"),
                "event_type", "n", "total_value")
            .orderBy("win_start", "event_type"))


# -------------------------------------------------------------- as-of join
@register("q_asof_prior_login", sql="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
s AS (SELECT * FROM events WHERE event_type = 'signup'),
m AS (SELECT p.event_id AS purchase_id, p.user_id,
             MAX(s.ts) AS mts
      FROM p JOIN s ON p.user_id = s.user_id
                   AND s.ts < p.ts
                   AND s.ts >= p.ts - INTERVAL 2 HOUR
      GROUP BY p.event_id, p.user_id)
SELECT m.purchase_id,
       CAST(MAX(s2.event_id) AS BIGINT) AS signup_id
FROM m JOIN s s2 ON s2.user_id = m.user_id AND s2.ts = m.mts
GROUP BY m.purchase_id ORDER BY m.purchase_id
""")
def q_asof_prior_login(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3-family as-of join (operators/asof.py): for each purchase,
    the most recent signup of the same user within 2h (strict,
    max-event_id tie-break)."""
    from dygiepp_spark.operators.asof import asof_join
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    s = ev.filter(F.col("event_type") == "signup")
    out = asof_join(p, s, on="user_id", tolerance_sec=7200, strict=True)
    return (out.select(F.col("event_id").alias("purchase_id"),
                       F.col("r_event_id").cast("bigint")
                       .alias("signup_id"))
            .orderBy("purchase_id"))
