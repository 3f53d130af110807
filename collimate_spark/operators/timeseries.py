"""Rolling / smoothing time-series statistics over ``events``.

The reference's converter feeds downstream time-series tooling it does not
itself contain (SURVEY.md §2.2); these are the canonical per-series rolling
operators such a consumer runs, each expressed as ONE window pass (no
self-joins, no driver loops):

- exact rolling median (order-statistic in a ROWS frame),
- truncated normalized EWMA (exponential weights inside a ROWS frame),
- rolling z-score anomaly flagging (trailing mean/stddev),
- first-order Markov transition matrix of event types.

Scale posture: every operator partitions its window by ``user_id`` — the
natural series key, high-cardinality, so the sort-based window exchange
spreads evenly across executors; frames are fixed ROWS frames so state per
row is O(frame), never O(series). The median/EWMA frames materialize a
``collect_list`` of at most FRAME values per row (bounded payload), then
reduce it with JVM higher-order functions — no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from collimate_spark.catalog import load_table

# Series order: ts then event_id — event ids are unique, so every window
# order below is total and deterministic.
_ORDER_SQL = "PARTITION BY user_id ORDER BY ts, event_id"


def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of ``value`` over the trailing 5 observations
    per user (ROWS 4 PRECEDING). Spark has no exact percentile window
    aggregate, so the operator is composed from built-ins: collect the
    bounded frame, ``array_sort`` it, and pick/interpolate the middle —
    identical to DuckDB's interpolating ``median(...) OVER``. The frame
    payload is ≤5 doubles per row: constant memory at any scale.

    r13: the sorted frame is projected ONCE behind an alias — inline,
    the median expression references it from six subtrees and
    ``array_sort`` is CodegenFallback (no CSE), so each row sorted its
    frame up to six times. Back-to-back min-of-4: 2.42 → 0.86 s (the
    before-arm ran on a noisier slice; an earlier quiet probe had the
    inline form at 1.54 s — every after-sample beat every before-sample
    either way)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    framed = ev.select(
        "user_id",
        "event_id",
        "value",
        F.array_sort(F.collect_list("value").over(w)).alias("sf"),
    )
    sorted_frame = F.col("sf")
    n = F.size(sorted_frame)
    mid_hi = F.element_at(sorted_frame, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(sorted_frame, (n / 2).cast("int"))
    median = F.when(n % 2 == 1, F.element_at(sorted_frame, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2
    )
    return (
        framed.select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(median, 4).alias("rolling_median"),
        )
        .orderBy("user_id", "event_id")
    )


ROLLING_MEDIAN_SQL = f"""
SELECT user_id, event_id, ROUND(value, 2) AS value,
       ROUND(median(CAST(value AS DOUBLE))
               OVER ({_ORDER_SQL} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             4) AS rolling_median
FROM events
ORDER BY user_id, event_id
"""


def ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated, normalized EWMA (alpha = 0.3) over the trailing 8
    observations per user. The untruncated recurrence is inherently
    sequential per series; truncating to a ROWS frame makes it a bounded
    window aggregate — each row reduces its ≤8-value frame with JVM
    higher-order functions (``transform`` + ``aggregate``), so the plan is
    one window exchange and zero Python. Weight for the i-th (0-based)
    element of an n-frame is (1-alpha)^(n-1-i), normalized to sum 1 —
    pandas' ``ewm(alpha=.3, adjust=True)`` over the same frame.

    r13: the weight array is projected ONCE behind an alias — inline,
    the numerator and denominator lambdas each re-ran the pow() chain
    per element (16 pows/row instead of 8; HOFs are CodegenFallback, no
    CSE). The numerator multiplies the same (x_i, w_i) doubles via
    ``zip_with`` and both sides fold in the same element order, so every
    intermediate double is bit-identical to the inline form."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
    frame = F.collect_list("value").over(w)
    ewma = F.expr(
        """
        aggregate(zip_with(frame, ws, (x, w) -> x * w), 0D, (acc, x) -> acc + x)
        / aggregate(ws, 0D, (acc, x) -> acc + x)
        """
    )
    return (
        ev.withColumn("frame", frame)
        .withColumn(
            "ws",
            F.expr("transform(frame, (x, i) -> pow(0.7, size(frame) - 1 - i))"),
        )
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(ewma, 4).alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )


# DuckDB's list_transform index is 1-based (Spark's transform is 0-based):
# exponent len(l)-j there equals n-1-i here.
EWMA_SQL = f"""
WITH frames AS (
  SELECT user_id, event_id, value,
         list(CAST(value AS DOUBLE))
           OVER ({_ORDER_SQL} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS l
  FROM events
)
SELECT user_id, event_id, ROUND(value, 2) AS value,
       ROUND(
         list_sum(list_transform(l, (x, j) -> x * pow(0.7, len(l) - j)))
         / list_sum(list_transform(l, (x, j) -> pow(0.7, len(l) - j))),
         4) AS ewma
FROM frames
ORDER BY user_id, event_id
"""


def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each observation scored against
    the trailing 20-row mean/stddev of its own series; rows with
    |z| > 2.5 (and ≥10 observations of history) are flagged. One window
    pass computing three aggregates over the same frame — Catalyst
    collapses them into a single window physical node."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    mean, std, cnt = F.avg("value").over(w), F.stddev_samp("value").over(w), F.count("value").over(w)
    z = (F.col("value") - mean) / std
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            cnt.alias("n_hist"),
            F.round(z, 4).alias("zscore"),
        )
        .filter((F.col("n_hist") >= 10) & (F.abs("zscore") > 2.5))
        .orderBy("user_id", "event_id")
    )


ANOMALY_ZSCORE_SQL = f"""
WITH scored AS (
  SELECT user_id, event_id, ROUND(value, 2) AS value,
         COUNT(value) OVER w AS n_hist,
         ROUND((value - AVG(value) OVER w) / stddev_samp(value) OVER w, 4) AS zscore
  FROM events
  WINDOW w AS ({_ORDER_SQL} ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT * FROM scored
WHERE n_hist >= 10 AND ABS(zscore) > 2.5
ORDER BY user_id, event_id
"""


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: per-user
    ``lag`` pairs consecutive events, then one hash aggregation counts
    transitions and a tiny window normalizes rows to probabilities. The
    lag window shuffles on user_id (high-cardinality, even); the
    transition matrix itself is |types|² rows — metadata-sized at any
    corpus scale."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy("prev_type")
    return (
        counts.withColumn("prob", F.round(F.col("n") / F.sum("n").over(total), 4))
        .orderBy("prev_type", "event_type")
    )


MARKOV_SQL = f"""
WITH pairs AS (
  SELECT LAG(event_type) OVER ({_ORDER_SQL}) AS prev_type, event_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 4) AS prob
FROM counts
ORDER BY prev_type, event_type
"""


# ---------------------------------------------------------------------------
# Day-of-week seasonal decomposition


def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week seasonality per event_type: mean
    ``value`` for each weekday divided by the type's overall mean — the
    classic seasonal-index step of a decomposition (factor > 1 ⇒ that
    weekday runs hot). Both engines index Sunday=0 (Spark dayofweek-1,
    DuckDB dow).

    Scale: the fact table folds once into the (event_type × 7) sum/count
    grid — one low-cardinality groupBy with map-side partials — and the
    overall mean is a window over that ≤ 35-row grid, not a second fact
    pass. The factor is a ratio of sums, so it is exactly reproducible
    regardless of row order."""
    ev = load_table(spark, "events", sf_dir)
    grid = (
        ev.groupBy(
            "event_type", (F.dayofweek("ts") - 1).alias("dow")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
    )
    w = Window.partitionBy("event_type")
    dow_avg = F.col("sum_v") / F.col("n")
    overall_avg = F.sum("sum_v").over(w) / F.sum("n").over(w)
    return (
        grid.select(
            "event_type",
            "dow",
            "n",
            F.round(dow_avg, 4).alias("dow_avg"),
            F.round(dow_avg / overall_avg, 4).alias("seasonal_factor"),
        )
        .orderBy("event_type", "dow")
    )


DOW_SEASONALITY_SQL = """
WITH grid AS (
  SELECT event_type, dayofweek(ts) AS dow,
         COUNT(*) AS n, SUM(value) AS sum_v
  FROM events GROUP BY 1, 2
)
SELECT event_type, dow, n,
       ROUND(sum_v / n, 4) AS dow_avg,
       ROUND((sum_v / n) / (SUM(sum_v) OVER (PARTITION BY event_type)
                            / SUM(n) OVER (PARTITION BY event_type)), 4)
         AS seasonal_factor
FROM grid
ORDER BY event_type, dow
"""


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily event series


def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series — the
    periodicity diagnostic behind seasonality/forecast choices (a lag-7
    spike ⇒ weekly cycle). Pairs (x_t, x_{t-k}) come from one ordered
    window with seven lag() columns, stacked long; each lag's Pearson r
    is a plain corr aggregate over its pairs.

    Scale: the fact table folds once into the calendar-sized daily
    series (one groupBy); everything after — the lag window, the stack,
    seven corr aggregates — runs on ~n_days rows, so the plan is a fact
    scan plus metadata-sized work regardless of corpus size."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cnt", *[F.lag("cnt", k).over(w).alias(f"l{k}") for k in range(1, 8)]
    )
    stack_expr = "stack(7, " + ", ".join(f"{k}, l{k}" for k in range(1, 8)) + ") AS (lag, prev)"
    pairs = lagged.selectExpr("cnt", stack_expr).filter(F.col("prev").isNotNull())
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("cnt", "prev"), 4).alias("acf"),
        )
        .orderBy("lag")
    )


ACF_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1
), lagged AS (
  SELECT cnt,
         LAG(cnt, 1) OVER w AS l1, LAG(cnt, 2) OVER w AS l2,
         LAG(cnt, 3) OVER w AS l3, LAG(cnt, 4) OVER w AS l4,
         LAG(cnt, 5) OVER w AS l5, LAG(cnt, 6) OVER w AS l6,
         LAG(cnt, 7) OVER w AS l7
  FROM daily WINDOW w AS (ORDER BY day)
), pairs AS (
  SELECT cnt, 1 AS lag, l1 AS prev FROM lagged
  UNION ALL SELECT cnt, 2, l2 FROM lagged
  UNION ALL SELECT cnt, 3, l3 FROM lagged
  UNION ALL SELECT cnt, 4, l4 FROM lagged
  UNION ALL SELECT cnt, 5, l5 FROM lagged
  UNION ALL SELECT cnt, 6, l6 FROM lagged
  UNION ALL SELECT cnt, 7, l7 FROM lagged
)
SELECT lag, COUNT(*) AS n_pairs, ROUND(CORR(cnt, prev), 4) AS acf
FROM pairs WHERE prev IS NOT NULL
GROUP BY lag
ORDER BY lag
"""


QUERIES = {
    "rolling_median_value": rolling_median_value,
    "ewma_value": ewma_value,
    "anomaly_zscore": anomaly_zscore,
    "markov_transitions": markov_transitions,
    "dow_seasonality": dow_seasonality,
    "acf_daily_events": acf_daily_events,
}

ORACLES = {
    "dow_seasonality": DOW_SEASONALITY_SQL,
    "acf_daily_events": ACF_SQL,
    "rolling_median_value": ROLLING_MEDIAN_SQL,
    "ewma_value": EWMA_SQL,
    "anomaly_zscore": ANOMALY_ZSCORE_SQL,
    "markov_transitions": MARKOV_SQL,
}
