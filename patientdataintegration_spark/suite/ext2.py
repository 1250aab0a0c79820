"""Round-4 extension suite: OLAP surface breadth (rollup/pivot),
behavioral analytics (retention, transitions, streaks, trend deltas),
distribution statistics (exact interpolated percentiles) and data-
quality audits (referential orphans).

Same exactness contract as `suite/ext.py`: integer-valued sums ride
exact in doubles/decimals, rounded outputs normalize IEEE -0.0 with
`+ 0.0`, and every aggregate/computed column carries the SAME alias
in the Spark plan and the DuckDB oracle so the driver's column-sorted
value hash lines up.

Scale notes per query are in the docstrings; the common theme: each
query is one-to-three shuffles on 8-byte keys, subtotal frames are
tiny and broadcast, and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from patientdataintegration_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# --- ROLLUP / grouping sets --------------------------------------------------


@_register(
    "q145_equidepth_histogram",
    """
    WITH r AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS x,
             ntile(8) OVER (ORDER BY CAST(l_extendedprice AS DOUBLE),
                            l_orderkey, l_linenumber) AS bin
      FROM lineitem
    )
    SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
           ROUND(MIN(x), 2) AS bin_min, ROUND(MAX(x), 2) AS bin_max
    FROM r GROUP BY bin
    """,
)
def q145_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 quantile bins of extended price) — the
    sibling of q143's equi-width bins: bin boundaries adapt to the
    distribution, so each bin holds the same row count ±1. `ntile`
    is pure row_number arithmetic over a DETERMINISTIC total order
    (value + the (orderkey, linenumber) key as tiebreak), hence
    engine-exact. Scale note: exact global ntile is a range-partition
    total sort — the oracle-pinnable form; at 100 TB compute bin
    BOUNDARIES with approx_percentile (mergeable sketch, no global
    sort) and bucket by boundary instead."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy(
        F.col("l_extendedprice").cast("double"), "l_orderkey", "l_linenumber"
    )
    r = li.select(
        F.col("l_extendedprice").cast("double").alias("x"),
        F.ntile(8).over(w).alias("bin"),
    )
    return r.groupBy(F.col("bin").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("x"), 2).alias("bin_min"),
        F.round(F.max("x"), 2).alias("bin_max"),
    )


# --- PIVOT -------------------------------------------------------------------

_Q146_LANGS = ("de", "en", "es", "fr", "zh")


@_register(
    "q146_pivot_lang",
    "SELECT source, "
    + ", ".join(
        f"COUNT(*) FILTER (WHERE lang = '{lg}') AS {lg}" for lg in _Q146_LANGS
    )
    + " FROM documents GROUP BY source",
)
def q146_pivot_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab source × language — the pivot surface. Explicit value
    list keeps it ONE scan + one aggregate (no distinct-values
    pre-pass); each cell is a conditional count, so the plan is a
    plain hash aggregate with 5 count columns, map-side partialed.
    The oracle spells the same thing as FILTERed counts (engine-
    portable pivot semantics)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .pivot("lang", list(_Q146_LANGS))
        .count()
        .na.fill(0, list(_Q146_LANGS))
    )


# --- retention cohorts -------------------------------------------------------


@_register(
    "q147_retention_cohorts",
    """
    WITH w AS (
      SELECT user_id, CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week
      FROM events
    ),
    c AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id)
    SELECT c.cohort_week,
           w.week - c.cohort_week AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
    FROM w JOIN c ON w.user_id = c.user_id
    GROUP BY c.cohort_week, w.week - c.cohort_week
    """,
)
def q147_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-activity
    week (cohort), counted distinct at each week offset — the
    behavioral-analytics staple. The cohort week is a window MIN over
    the user partition rather than an aggregate-and-join-back, so
    events scan ONCE (the join-back shape re-reads the fact table —
    a second full scan at 100 TB): one shuffle on user_id for the
    window, one on the tiny (cohort, offset) key for the distinct
    count. Epoch-week integers avoid cross-engine date-truncation
    differences."""
    e = load_table(spark, sf_dir, "events")
    wuser = Window.partitionBy("user_id")
    w = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(604800)).cast("bigint").alias("week"),
    ).withColumn("cohort_week", F.min("week").over(wuser))
    return (
        w.groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


# --- event transition matrix (first-order Markov) ---------------------------


@_register(
    "q148_markov_transitions",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM s WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY prev_type), 6)
             AS p_transition
    FROM t
    """,
)
def q148_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix per user stream: lag
    window → (prev, next) counts → row-normalized probabilities —
    the sequence-mining primitive (what follows what?). One window
    shuffle on user_id, one aggregate on the 25-cell transition key,
    and a window over the TINY aggregated frame for the row sums
    (integer counts, so the normalizing division is the only FP
    step)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    s = e.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    t = (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum(F.col("n").cast("double")).over(wp), 6
        ).alias("p_transition"),
    )


# --- exact interpolated percentiles -----------------------------------------


@_register(
    "q149_percentiles",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
           ROUND(quantile_cont(value, 0.9), 6) + 0.0 AS p90,
           ROUND(quantile_cont(value, 0.99), 6) + 0.0 AS p99
    FROM events GROUP BY event_type
    """,
)
def q149_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of event value per
    type — the latency/SLA-style distribution summary. Spark's exact
    `percentile` and DuckDB's `quantile_cont` share the (n-1)·p
    linear-interpolation definition, so rounded outputs hash-match.
    At 100 TB swap `percentile` for `percentile_approx` (t-digest,
    mergeable partial sketches — no per-group full sort); the exact
    form is what the oracle can pin."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.expr("percentile(value, 0.5D)"), 6) + F.lit(0.0)).alias("p50"),
        (F.round(F.expr("percentile(value, 0.9D)"), 6) + F.lit(0.0)).alias("p90"),
        (F.round(F.expr("percentile(value, 0.99D)"), 6) + F.lit(0.0)).alias("p99"),
    )


# --- referential-integrity audit --------------------------------------------


@_register(
    "q150_orphan_audit",
    """
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
)
def q150_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts along three FK
    edges via LEFT ANTI joins — the data-quality gate a pipeline runs
    before publishing a snapshot. Each anti-join shuffles only the
    join keys (column-pruned scans); the parent side of
    customer->nation is 25 rows and broadcasts. Constant-labeled
    1-row aggregates union into the report frame."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation").select("n_nationkey")

    def count_orphans(child, parent, on, label):
        return (
            child.join(parent, on=on, how="left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        count_orphans(
            li,
            o.select("o_orderkey"),
            li["l_orderkey"] == o["o_orderkey"],
            "lineitem->orders",
        )
        .unionByName(
            count_orphans(
                o.select("o_custkey"),
                cu.select("c_custkey"),
                o["o_custkey"] == cu["c_custkey"],
                "orders->customer",
            )
        )
        .unionByName(
            count_orphans(
                cu.select("c_nationkey"),
                F.broadcast(na),
                cu["c_nationkey"] == na["n_nationkey"],
                "customer->nation",
            )
        )
    )


# --- gaps-and-islands activity streaks --------------------------------------


@_register(
    "q151_activity_streaks",
    """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ),
    r AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d
    ),
    runs AS (
      SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS max_streak
    FROM runs GROUP BY user_id
    """,
)
def q151_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user — the gaps-and-
    islands pattern: distinct active days, then `day − row_number`
    constant-per-run keys, then run lengths. All integer arithmetic
    on epoch-days (no date types → no cross-engine calendar edge
    cases); the distinct, the window and the two aggregates all
    partition on user_id, so AQE coalesces them onto one exchange."""
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("bigint").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("grp")
    )
    runs = r.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("max_streak"),
    )


# --- week-over-week deltas ---------------------------------------------------


@_register(
    "q152_wow_change",
    """
    WITH w AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week,
             COUNT(*) AS n
      FROM events GROUP BY event_type, 2
    ),
    l AS (
      SELECT event_type, week, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      FROM w
    )
    SELECT event_type, week, CAST(n AS BIGINT) AS n,
           CAST(prev_n AS BIGINT) AS prev_n,
           ROUND((CAST(n AS DOUBLE) - prev_n) / prev_n * 100, 6) + 0.0
             AS pct_change
    FROM l
    """,
)
def q152_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change of event volume per type — the
    trend-delta report. Aggregate first (events collapse to a
    |types|×|weeks| frame), THEN window-lag over the tiny series:
    the window shuffle moves aggregate rows, never raw events. First
    week per type has NULL prev/pct on both engines; the rounded
    difference-derived pct normalizes -0.0 (+ 0.0)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        e.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / F.lit(604800))
            .cast("bigint")
            .alias("week"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lw = Window.partitionBy("event_type").orderBy("week")
    lagged = w.select(
        "event_type",
        "week",
        F.col("n").cast("bigint").alias("n"),
        F.lag("n").over(lw).cast("bigint").alias("prev_n"),
    )
    return lagged.select(
        "event_type",
        "week",
        "n",
        "prev_n",
        (
            F.round(
                (F.col("n").cast("double") - F.col("prev_n"))
                / F.col("prev_n")
                * 100,
                6,
            )
            + F.lit(0.0)
        ).alias("pct_change"),
    )
