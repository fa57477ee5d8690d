"""Hypertable-style time-series operators over the events fact.

The reference's event pipeline (etl models over the transactions
stream) stops at tumbling aggregates; these are the continuous-series
operations a timeseries engine layers on top of the same data — each
re-expressed as a declarative Spark plan with an exact DuckDB twin:

- gap-filled LOCF resampling (``time_bucket_gapfill`` + ``locf`` in
  TimescaleDB's public API): project every (user, day) cell of a dense
  calendar grid, carrying the last observation forward;
- dyadic-decay weighted moving average: an EWMA whose decay is a power
  of two, so the whole kernel is exact BIGINT arithmetic — order-free,
  codegen-fast, bit-identical across engines (the float EWMA recurrence
  is partition-order-dependent and can never hash-match);
- interval (banded range) join: point-in-interval classification done
  as an equi-join on quantized buckets + exact residual filter — the
  plan shape that scales to millions of intervals where a broadcast
  nested-loop or theta-join cannot.

Determinism conventions as everywhere (operators/spec.py): values ride
scale-2 BIGINT fixed point, one final IEEE division sequence, unique
sort tie-breaks, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.money import fixed
from ..sources.registry import load_table
from .spec import QuerySpec


def events_gap_fill_locf(spark, sf_dir):
    """Gap-filled daily LOCF rollup: each user's `value` series is
    resampled onto the dense day grid (global min..max event day),
    missing days carry the user's last observed value forward, and the
    grid is aggregated per day into carried-vs-observed counts and the
    total last-known value — the "sum of last-known readings per day"
    query TimescaleDB writes as time_bucket_gapfill + locf + sum.

    Scale shape: the day grid is calendar-bounded (30 cells here; 365/
    year regardless of data volume) and built lazily from a 1-row
    bounds aggregate — broadcast, never collected. Per-user density is
    scale-invariant in this dataset (~67 events / 30 days at every SF),
    so the grid is O(users × days) ≈ O(fact/2). Three narrow fact
    shuffles: daily-last window on (user, day), grid left-join on the
    same key, LOCF window on user — each partition holds one user's
    ≤ |days| cells, bounded by the calendar, not the data.

    Determinism: daily-last picks the (ts, event_id)-max row via
    row_number (unique tie-break), LOCF rows are exact BIGINT cents,
    counts are longs, and the one double emitted is a single division.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    base = ev.select("user_id", day, "ts", "event_id", fixed("value").alias("vfp"))

    rn = F.row_number().over(
        W.partitionBy("user_id", "day").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    daily = base.select("user_id", "day", "vfp", rn.alias("rn")).filter(
        F.col("rn") == 1
    )

    # dense calendar grid: 1-row bounds agg exploded to the day axis,
    # broadcast-joined onto the per-user first-day frame (no collect —
    # the grid stays a lazy plan fragment)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    users = base.groupBy("user_id").agg(F.min("day").alias("first_day"))
    grid = users.join(F.broadcast(days), F.col("day") >= F.col("first_day"))

    locf = F.last("vfp", ignorenulls=True).over(
        W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    filled = grid.join(daily, ["user_id", "day"], "left").select(
        "day", F.col("vfp").isNull().alias("is_fill"), locf.alias("locf")
    )
    return (
        filled.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("users_total"),
            F.count(F.when(F.col("is_fill"), 1)).alias("users_carried"),
            (F.sum("locf").cast("double") / F.lit(100.0)).alias("total_value"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "users_total",
            "users_carried",
            "total_value",
        )
    )


GAP_FILL_ORACLE = """
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vfp
  FROM events),
daily AS (
  SELECT user_id, day, vfp FROM (
    SELECT user_id, day, vfp,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM base) WHERE rn = 1),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM base),
days AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds),
users AS (SELECT user_id, min(day) AS first_day FROM base GROUP BY 1),
grid AS (
  SELECT u.user_id, d.day FROM users u JOIN days d ON d.day >= u.first_day),
filled AS (
  SELECT g.day, dl.vfp IS NULL AS is_fill,
         last_value(dl.vfp IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS UNBOUNDED PRECEDING) AS locf
  FROM grid g LEFT JOIN daily dl
    ON dl.user_id = g.user_id AND dl.day = g.day)
SELECT strftime(day, '%Y-%m-%d') AS day,
       count(*) AS users_total,
       count(CASE WHEN is_fill THEN 1 END) AS users_carried,
       CAST(sum(locf) AS DOUBLE) / 100.0 AS total_value
FROM filled GROUP BY 1
"""


def events_dyadic_wma(spark, sf_dir, k: int = 8):
    """Weighted moving average with dyadic (power-of-two) decay at each
    user's latest event: weights 2^(k-1) … 2^0 over the last k
    observations, normalized by 2^k − 1. This is the EWMA shape
    (alpha = 1/2) restated so the entire kernel is exact BIGINT
    arithmetic: cents × power-of-two weights sum without rounding, and
    the single final division is the only float op — the recurrence
    form (`s = a·x + (1−a)·s`) accumulates doubles in partition order
    and cannot be reproduced bit-exactly by two engines.

    Scale shape: ONE window shuffle on user_id; the k lag() terms share
    the window frame, and per-user state is k longs. Users with fewer
    than k events are excluded (the truncated-window mean is a
    different estimator; emitting it silently would be wrong).

    Overflow headroom: |vfp| ≤ 5e4 cents here, sum ≤ 2^k·5e4 ≈ 1.3e7 —
    ~7e11 headroom under int64 even at 100 TB row counts (per-row
    magnitude, not row count, bounds this sum)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id", "ts", "event_id", fixed("value").alias("vfp")
    )
    num = sum(
        (F.lag("vfp", j).over(w) if j else F.col("vfp")) * (2 ** (k - 1 - j))
        for j in range(k)
    )
    seq = base.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n_events"),
        num.alias("num"),
    )
    den = float((2**k - 1) * 100)
    return seq.filter((F.col("rn") == F.col("n_events")) & (F.col("n_events") >= k)).select(
        "user_id",
        "n_events",
        (F.col("num").cast("double") / F.lit(den)).alias("wma"),
    )


def _dyadic_wma_oracle(k: int = 8) -> str:
    """Oracle generated from the same k the operator uses (the
    _sessionize_oracle pattern, r12): weights, denominator and the
    n_events floor all derive from one place."""
    terms = " + ".join(
        (f"vfp * {2 ** (k - 1)}" if j == 0
         else f"lag(vfp, {j}) OVER w * {2 ** (k - 1 - j)}" if k - 1 - j > 0
         else f"lag(vfp, {j}) OVER w")
        for j in range(k)
    )
    return f"""
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS vfp
  FROM events),
seq AS (
  SELECT user_id,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         {terms} AS num
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, n_events, CAST(num AS DOUBLE) / {float((2 ** k - 1) * 100)} AS wma
FROM seq WHERE rn = n_events AND n_events >= {k}
"""


DYADIC_WMA_ORACLE = _dyadic_wma_oracle()


# Value tiers for the interval join: arbitrary-width, half-open [lo, hi).
# Non-overlapping and EXHAUSTIVE: the top tier is open-ended (r13
# review — the old 500.0 cap silently dropped real events, max value
# 560.21 at sf1, from every tier on BOTH engines, so the oracle could
# never catch the loss; the same silent-drop class audience_overlap
# guards fail-loud).
VALUE_TIERS: list[tuple[str, float, float]] = [
    ("micro", 0.0, 25.0),
    ("small", 25.0, 75.0),
    ("mid", 75.0, 150.0),
    ("large", 150.0, 300.0),
    ("whale", 300.0, float("inf")),
]
_BUCKET_W = 25.0
# quantization cap for the open top tier: fact buckets clamp here, so
# every value ≥ CAP·width lands in the top tier's last bucket and the
# exact residual [lo, ∞) filter admits it
_CAP_BUCKET = 20


def interval_join_value_tiers(spark, sf_dir):
    """Interval (banded range) join: classify each event's `value` into
    an arbitrary-width [lo, hi) tier and aggregate per tier. The naive
    plan is a theta-join (value BETWEEN lo AND hi) — a broadcast
    nested-loop that degenerates to O(rows × intervals). This plan
    quantizes instead: every interval explodes to the fixed-width
    buckets it covers, the fact side computes one bucket key per row,
    and the join is a plain hash equi-join on the bucket followed by
    the exact residual range filter. Bucketization keeps the join
    linear in rows + covered buckets, so it survives millions of
    intervals (the public range-join optimization in Spark-on-
    Databricks / Flink interval joins; here built from stock operators).

    The tier table is inline (5 rows) — small enough to broadcast — but
    the plan is written as the equi-join deliberately: the docetted
    point is the shape that still works when the interval side is a
    fact in its own right.

    Determinism: tier boundaries and floor(value / width) are exact
    doubles both engines; money sums ride scale-2 BIGINT."""
    import math

    ev = load_table(spark, sf_dir, "events")
    # bucket list built driver-side (5 bounded tiers): the open top
    # tier enumerates up to the clamp bucket instead of floor(inf/w)
    bucket_rows = [
        (t, lo, hi, b)
        for t, lo, hi in VALUE_TIERS
        for b in range(
            int(lo // _BUCKET_W),
            (_CAP_BUCKET if math.isinf(hi) else int(hi // _BUCKET_W)) + 1,
        )
    ]
    tier_buckets = spark.createDataFrame(
        bucket_rows, schema="tier string, lo double, hi double, bucket int"
    )
    facts = ev.select(
        "user_id",
        "value",
        fixed("value").alias("vfp"),
        F.least(
            F.floor(F.col("value") / _BUCKET_W), F.lit(_CAP_BUCKET)
        ).cast("int").alias("bucket"),
    )
    joined = facts.join(F.broadcast(tier_buckets), "bucket").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    # distinct-users via per-(tier, user) pre-aggregation, not
    # countDistinct: the expand form rewrites the plan to duplicate
    # every fact row per distinct-aggregate (measured 6.7 s vs 2.4 s at
    # sf10); the regroup shuffles only user-grain partials
    per_user = joined.groupBy("tier", "lo", "hi", "user_id").agg(
        F.count(F.lit(1)).alias("n_e"), F.sum("vfp").alias("sv")
    )
    return (
        per_user.groupBy("tier", "lo", "hi")
        .agg(
            F.sum("n_e").alias("n_events"),
            F.count(F.lit(1)).alias("n_users"),
            (F.sum("sv").cast("double") / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("lo")
    )


_TIER_VALUES = ", ".join(
    "('{}', {}, {})".format(
        t, lo, "CAST('infinity' AS DOUBLE)" if hi == float("inf") else hi
    )
    for t, lo, hi in VALUE_TIERS
)

INTERVAL_TIERS_ORACLE = f"""
WITH tiers(tier, lo, hi) AS (VALUES {_TIER_VALUES})
SELECT t.tier, t.lo, t.hi,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY 1, 2, 3 ORDER BY t.lo
"""


_ZS_WIN = 20  # trailing observations per anomaly decision
_ZS_THRESH = 2.0


def events_rolling_zscore(spark, sf_dir):
    """Rolling-window anomaly detection: flag events whose value sits
    more than 2 sample standard deviations from the mean of the user's
    previous 20 observations (the self-excluding trailing window — the
    classic online z-score / Bollinger-band rule).

    Exactness: the rolling frame carries only two BIGINT sums (Σv, Σv²
    in cents; v² ≤ 2.5e9 · 20 ≈ 5e10 per frame — per-frame magnitude,
    not row count, bounds them), the variance numerator n·Σv² − (Σv)²
    is exact integer algebra, and the float tail is division → sqrt →
    one subtraction → one division. IEEE sqrt is correctly rounded, so
    every step is bit-identical across engines — a naive rolling
    stddev() would accumulate floats in engine-specific order and never
    hash-match. Rows with zero trailing variance cannot be scored
    (z undefined) and are excluded explicitly.

    Scale shape: ONE window shuffle on user_id; per-row state is the
    frame's two longs. Anomaly fraction is scale-invariant (~2-4% of
    eligible rows at every SF)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("user_id", "ts", "event_id", "value", fixed("value").alias("vfp"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ZS_WIN, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("vfp").over(w)
    s2 = F.sum(F.col("vfp") * F.col("vfp")).over(w)
    scored = base.select(
        "user_id",
        "event_id",
        "value",
        "vfp",
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
    ).filter(F.col("n") == _ZS_WIN)
    var_num = F.lit(_ZS_WIN) * F.col("s2") - F.col("s1") * F.col("s1")
    std = F.sqrt(var_num.cast("double") / F.lit(float(_ZS_WIN * (_ZS_WIN - 1))))
    z = (
        F.col("vfp").cast("double") - F.col("s1").cast("double") / F.lit(float(_ZS_WIN))
    ) / std
    return (
        scored.filter(var_num > 0)
        .select(
            "user_id",
            "event_id",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > _ZS_THRESH)
    )


ROLLING_ZSCORE_ORACLE = f"""
WITH base AS (
  SELECT user_id, ts, event_id, value,
         CAST(round(value * 100) AS BIGINT) AS vfp
  FROM events),
scored AS (
  SELECT user_id, event_id, value, vfp,
         count(*) OVER w AS n, sum(vfp) OVER w AS s1,
         sum(vfp * vfp) OVER w AS s2
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_ZS_WIN} PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT user_id, event_id, value,
         round((CAST(vfp AS DOUBLE) - CAST(s1 AS DOUBLE) / {float(_ZS_WIN)})
               / sqrt(CAST({_ZS_WIN} * s2 - s1 * s1 AS DOUBLE)
                      / {float(_ZS_WIN * (_ZS_WIN - 1))}), 6) AS zscore
  FROM scored
  WHERE n = {_ZS_WIN} AND {_ZS_WIN} * s2 - s1 * s1 > 0)
SELECT user_id, event_id, value, zscore FROM z WHERE abs(zscore) > {_ZS_THRESH}
"""


def trend_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend: per event_type, the MEDIAN of all
    pairwise daily slopes (Sen 1968) — the estimator that shrugs off
    the outlier days that drag the OLS slope (`trend_daily_slope`)
    around. Median selection (not summation) keeps floats exact: each
    slope is one subtraction + two divisions on exact integers, and
    both engines interpolate the even-count median identically.

    Scale shape: the fact pays ONE daily-rollup shuffle with map-side
    combine; the pairwise self-join runs on the per-(type, day) frame —
    calendar-bounded (30 days → ≤435 pairs per type regardless of row
    count), equi-keyed on event_type with the x1 < x2 residual, so it
    never touches raw rows and never goes cartesian."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("x")
    ).agg(F.sum(fixed("value")).alias("yfp"))
    a = daily.select(
        F.col("event_type").alias("et"), F.col("x").alias("x1"), F.col("yfp").alias("y1")
    )
    b = daily.select(
        F.col("event_type").alias("et"), F.col("x").alias("x2"), F.col("yfp").alias("y2")
    )
    pairs = a.join(b, "et").filter(F.col("x1") < F.col("x2"))
    slope = (
        (F.col("y2") - F.col("y1")).cast("double")
        / (F.col("x2") - F.col("x1")).cast("double")
        / F.lit(100.0)
    )
    return (
        pairs.select("et", slope.alias("slope"))
        .groupBy(F.col("et").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias("sen_slope"),
        )
    )


THEIL_SEN_ORACLE = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         sum(CAST(round(value * 100) AS BIGINT)) AS yfp
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         CAST(b.yfp - a.yfp AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) / 100.0
           AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x < b.x)
SELECT event_type, count(*) AS n_pairs,
       round(quantile_cont(slope, 0.5), 6) AS sen_slope
FROM pairs GROUP BY 1
"""


def events_seasonal_anomaly(spark, sf_dir):
    """Seasonal-baseline anomaly detection on event volume: every
    (type, date, hour) cell's count is z-scored against the mean/std of
    the SAME weekday-hour slot across the table's date span — "is this
    Tuesday 14:00 unusually busy for a Tuesday 14:00" (the seasonal
    companion to `events_rolling_zscore`'s trailing-window rule; a
    trailing window flags Monday mornings as anomalies forever, a
    weekday-hour baseline does not).

    The grid is DENSE: hours with zero events are real observations of
    0, not missing rows, so the baseline is unbiased (the gapfill-LOCF
    calendar-grid shape — types × sequence(min_date, max_date) × 24,
    bounded by the calendar, never by the fact). Exactness: counts are
    integers; the variance numerator n·Σc² − (Σc)² is exact BIGINT
    algebra; the float tail is division → sqrt → subtraction → division
    (IEEE-identical both engines; population variance, n = #dates per
    slot). Scale shape: one fact shuffle to (type, date, hour) counts
    (map-side combined), then everything is calendar-grain.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(span))
        .select("event_type", F.explode(F.expr("sequence(mn, mx)")).alias("day"))
        .select("event_type", "day", F.explode(F.expr("sequence(0, 23)")).alias("hour"))
    )
    counts = ev.groupBy(
        F.col("event_type"),
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("c"))
    cells = (
        grid.join(counts, ["event_type", "day", "hour"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .withColumn("dow", F.dayofweek("day"))
    )
    stats = cells.groupBy("event_type", "dow", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    j = cells.join(stats, ["event_type", "dow", "hour"])
    mean = F.col("sc").cast("double") / F.col("n").cast("double")
    var = (
        (F.col("n") * F.col("sc2") - F.col("sc") * F.col("sc")).cast("double")
        / (F.col("n") * F.col("n")).cast("double")
    )
    std = F.sqrt(var)
    z = F.when(std > 0, (F.col("c").cast("double") - mean) / std).otherwise(
        F.lit(0.0)
    )
    return j.select(
        "event_type",
        # string day: pandas/duckdb DATE round-trips disagree (date vs
        # datetime64) — the gap_fill_locf convention
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "hour",
        "c",
        F.round(mean, 6).alias("slot_mean"),
        F.round(z, 6).alias("z"),
        # population z over n same-slot dates is capped at sqrt(n-1) — with
        # a ~30-day span n is 4-5, so a textbook |z|>2 can NEVER fire; 1.8
        # flags the attainable extreme (one date owning the slot's volume)
        (F.abs(z) > 1.8).alias("is_anomaly"),
    )


SEASONAL_ANOMALY_ORACLE = """
WITH span AS (SELECT min(CAST(ts AS DATE)) mn, max(CAST(ts AS DATE)) mx
              FROM events),
grid AS (
  SELECT t.event_type, d.day, h.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE
                AS day FROM span) d
  CROSS JOIN (SELECT unnest(range(0, 24)) AS hour) h),
counts AS (
  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hour,
         count(*) AS c
  FROM events GROUP BY 1, 2, 3),
cells AS (
  SELECT g.event_type, g.day, g.hour,
         COALESCE(c.c, 0) AS c, dayofweek(g.day) AS dow
  FROM grid g LEFT JOIN counts c
    ON g.event_type = c.event_type AND g.day = c.day AND g.hour = c.hour),
stats AS (
  SELECT event_type, dow, hour, count(*) AS n,
         sum(c) AS sc, sum(c * c) AS sc2
  FROM cells GROUP BY 1, 2, 3),
j AS (
  SELECT cells.*, n, sc, sc2,
         CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         sqrt(CAST(n * sc2 - sc * sc AS DOUBLE)
              / CAST(n * n AS DOUBLE)) AS std
  FROM cells JOIN stats USING (event_type, dow, hour))
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, hour, c,
       round(mean, 6) AS slot_mean,
       round(CASE WHEN std > 0 THEN (CAST(c AS DOUBLE) - mean) / std
                  ELSE 0.0 END, 6) AS z,
       abs(CASE WHEN std > 0 THEN (CAST(c AS DOUBLE) - mean) / std
                ELSE 0.0 END) > 1.8 AS is_anomaly
FROM j
"""


def orders_open_backlog_daily(spark, sf_dir):
    """Daily open-order backlog: how many orders are in flight (placed
    but not yet fully shipped) on every calendar day — the concurrent-
    intervals query. The naive form joins every order's [start, end]
    interval against every day (O(orders × days)); this is the
    difference-array restatement: each order contributes +1 on its
    start day and −1 the day after its last shipment, one day-keyed
    aggregation nets them, and a cumulative sum over the DENSE calendar
    grid recovers the backlog.

    Scale shape: the two fact tables NEVER JOIN (the first cut paired
    each order's start with its last shipment through a 15M×15M
    orderkey join — 79 s at sf10; re-derived away same-session): the
    +1 deltas are just the orders-by-day histogram, and the −1 deltas
    need only lineitem's per-order max shipdate. Orders with NO
    lineitems (257 exist in this data — the TPC-H ≥1-line invariant
    does not hold here, caught by the oracle when the join-free form
    landed) count as open forever, which is the truthful backlog
    semantics; the original join formulation silently dropped them.
    One
    l_orderkey shuffle (map-side combined), two day-grain histograms,
    and the only ordered scan runs over the bounded ~2500-day grid.

    Measured ladder (sf10, DuckDB 1.03 s): join form 79 s (r11) →
    difference-array 4.85 s → 3.46 s after deduplicating the span
    scalar (r13, below). The residual ~3 s is the per-order max — ONE
    exchange of 15M (orderkey, partial-max) rows — for which two more
    alternatives were measured and rejected (r13): max-over-window +
    distinct 7.2 s (sorts the fact); int-day projection before the agg
    2.8–3.0 s (within noise of the timestamp form — the exchange row
    count, not width, is the term). That exchange is the floor: the
    histogram needs each order's global max, and 15M groups cannot
    partially collapse further than map-side combine already does.
    Exactness: counts only; the backlog is an integer cumsum."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d0")
    )
    # max over the RAW timestamp (primitive-long fast path), truncated
    # to day once per group: to_date is monotone, so
    # max(to_date(x)) == to_date(max(x)) — saves one per-row conversion
    # on the full fact (60M evals → 15M at sf10).
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.to_date(F.max("l_shipdate")).alias("d1"))
    )
    opens = o.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("opened")
    )
    closes = last_ship.groupBy(F.date_add("d1", 1).alias("day")).agg(
        F.count(F.lit(1)).alias("closed")
    )
    deltas = (
        opens.join(closes, "day", "full")
        .select(
            "day",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("closed", F.lit(0)).alias("closed"),
        )
        .withColumn("net", F.col("opened") - F.col("closed"))
    )
    # max(per-order max) == global max shipdate — read it off the raw
    # fact (a stats-answerable scan agg) instead of re-running the
    # 15M-group orderkey aggregate a second time for one scalar (r13:
    # the last_ship subtree appeared twice; AQE exchange reuse does not
    # always catch it across the crossJoin boundary)
    mxs = load_table(spark, sf_dir, "lineitem").agg(
        F.to_date(F.max("l_shipdate")).alias("mxs")
    )
    span = o.agg(
        F.min("d0").alias("mn"), F.max("d0").alias("mxo")
    ).crossJoin(mxs).select(
        "mn", F.greatest("mxo", "mxs").alias("mx")
    )
    grid = span.select(F.explode(F.expr("sequence(mn, mx)")).alias("day"))
    cells = grid.join(deltas, "day", "left").select(
        "day",
        F.coalesce("net", F.lit(0)).alias("net"),
        F.coalesce("opened", F.lit(0)).alias("opened"),
        F.coalesce("closed", F.lit(0)).alias("closed"),
    )
    backlog = F.sum("net").over(
        W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    return cells.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "opened",
        "closed",
        backlog.alias("open_backlog"),
    )


OPEN_BACKLOG_ORACLE = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d0 FROM orders),
ls AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS d1
       FROM lineitem GROUP BY 1),
deltas AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net,
         CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS opened,
         CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS closed
  FROM (SELECT d0 AS day, 1 AS delta FROM o
        UNION ALL
        SELECT d1 + INTERVAL 1 DAY, -1 FROM ls)
  GROUP BY day),
span AS (SELECT (SELECT min(d0) FROM o) AS mn,
                greatest((SELECT max(d0) FROM o),
                         (SELECT max(d1) FROM ls)) AS mx),
grid AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
         FROM span),
cells AS (
  SELECT g.day, COALESCE(net, 0) AS net, COALESCE(opened, 0) AS opened,
         COALESCE(closed, 0) AS closed
  FROM grid g LEFT JOIN deltas d ON g.day = d.day)
SELECT strftime(day, '%Y-%m-%d') AS day, opened, closed,
       CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS open_backlog
FROM cells
"""


def events_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection on daily event volume per type: the
    day t maximizing |Σ_{i≤t}(c_i − mean)| over the dense calendar is
    the level-shift estimate (Page's cumulative-sum statistic with the
    global mean as reference — the batch form of the classic monitoring
    rule).

    Exactness: the statistic is kept as the INTEGER n·Σ_{i≤t}c_i − t·S
    (n days, S total events; dividing by n only at the end), so the
    argmax is decided on exact integers — a float cusum would make
    near-ties engine-dependent. Ties break on the earlier day. Scale
    shape: one fact shuffle to (type, day) counts; the cumulative scan
    and argmax run per type over the bounded calendar grid."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(span)).select(
        "event_type", F.explode(F.expr("sequence(mn, mx)")).alias("day")
    )
    counts = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    cells = grid.join(counts, ["event_type", "day"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0))
    )
    wt = W.partitionBy("event_type")
    cum = wt.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    scored = cells.select(
        "event_type",
        "day",
        (
            F.count(F.lit(1)).over(wt) * F.sum("c").over(cum)
            - F.row_number().over(wt.orderBy("day")) * F.sum("c").over(wt)
        ).alias("ncusum"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("c").over(wt).alias("s"),
    )
    pick = F.row_number().over(
        wt.orderBy(F.abs(F.col("ncusum")).desc(), F.col("day").asc())
    )
    return (
        scored.withColumn("rk", pick)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.round(
                F.col("ncusum").cast("double") / F.col("n").cast("double"), 6
            ).alias("cusum_peak"),
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), 6
            ).alias("daily_mean"),
        )
    )


CUSUM_ORACLE = """
WITH span AS (SELECT min(CAST(ts AS DATE)) mn, max(CAST(ts AS DATE)) mx
              FROM events),
grid AS (
  SELECT t.event_type, d.day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE
                AS day FROM span) d),
counts AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
           FROM events GROUP BY 1, 2),
cells AS (
  SELECT g.event_type, g.day, COALESCE(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON g.event_type = c.event_type AND g.day = c.day),
scored AS (
  SELECT event_type, day,
         count(*) OVER w_t
           * sum(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING)
           - row_number() OVER (PARTITION BY event_type ORDER BY day)
             * sum(c) OVER w_t AS ncusum,
         count(*) OVER w_t AS n, sum(c) OVER w_t AS s
  FROM cells
  WINDOW w_t AS (PARTITION BY event_type)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(ncusum) DESC, day ASC) AS rk
  FROM scored)
SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
       round(CAST(ncusum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cusum_peak,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS daily_mean
FROM ranked WHERE rk = 1
"""


def session_length_quantiles(spark, sf_dir, gap_minutes: int = 60):
    """Session-length distribution: exact interpolated P25/50/75/90/99
    of session duration (seconds) and of events-per-session, over
    gap-sessionized events (same 60-min islands construction as
    `sessionize_events`) — the distribution product teams put on every
    engagement dashboard.

    Exact quantiles WITHOUT per-group buffering: each metric reduces to
    a VALUE HISTOGRAM (durations are truncated seconds — domain bounded
    by the session-timeout policy, not the row count; event counts are
    small ints), the cumulative scan runs over the histogram, and the
    covering order statistics interpolate at rank r = (n−1)·q — the
    `quantile_stats_exact` machinery applied to a derived (sessions)
    frame. Scale shape: one user shuffle to build sessions, one
    histogram shuffle per metric (map-side combined), domain-grain
    everything after."""
    from ..functions.sessions import with_session_ids

    ev = load_table(spark, sf_dir, "events")
    sess = (
        with_session_ids(ev, gap_minutes)
        .groupBy("user_id", "session_id")
        .agg(
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    qs = [25, 50, 75, 90, 99]
    # ONE sessionization pass feeds BOTH metrics (r13 review: the old
    # per-metric closure embedded the full user-shuffle + window
    # sessionization subtree twice — the exact class the r12 fix below
    # removed for the session COUNT). Each session row explodes to
    # (metric, v); histograms build at (metric, value) grain and every
    # later window partitions by metric, so the fact-wide work runs
    # once and the added exchange carries 2 rows per session.
    mv = sess.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("duration_sec").alias("metric"),
                    F.col("duration_sec").cast("long").alias("v"),
                ),
                F.struct(
                    F.lit("n_events").alias("metric"),
                    F.col("n_events").cast("long").alias("v"),
                ),
            )
        ).alias("mv")
    ).select("mv.metric", "mv.v")
    hist = mv.groupBy("metric", "v").agg(F.count(F.lit(1)).alias("cnt"))
    cum = (
        W.partitionBy("metric").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    )
    full = W.partitionBy("metric").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    h = hist.select(
        "metric",
        "v",
        F.sum("cnt").over(cum).alias("c"),
        # session count rides on every h row (the frame-wide window sum)
        # — avoids a separate full sessionization pass just for the
        # count (r12 review)
        F.sum("cnt").over(full).alias("n"),
    )
    quants = spark.createDataFrame([(p,) for p in qs], "pct int")
    j = h.crossJoin(F.broadcast(quants))
    # rank r = (n-1)*pct/100; lo = value at floor(r)+1-th row,
    # hi = value at ceil(r)+1-th row (0-indexed ranks over sorted rows)
    # ceil as (a+99) div 100: non-negative operands, so Spark's
    # truncating `div` and DuckDB's flooring `//` agree (the
    # -floor(-x) trick would NOT — trunc != floor on negatives)
    lo_rank = F.expr("(n - 1) * pct div 100")
    hi_rank = F.expr("((n - 1) * pct + 99) div 100")
    lo = j.filter(F.col("c") >= lo_rank + 1).groupBy("metric", "pct").agg(
        F.min("v").alias("v_lo"), F.max("n").alias("n")
    )
    hi = j.filter(F.col("c") >= hi_rank + 1).groupBy("metric", "pct").agg(
        F.min("v").alias("v_hi")
    )
    frac = (
        ((F.col("n") - 1) * F.col("pct") % 100).cast("double") / F.lit(100.0)
    )
    return lo.join(hi, ["metric", "pct"]).select(
        "metric",
        "pct",
        F.round(
            F.col("v_lo").cast("double")
            + frac * (F.col("v_hi") - F.col("v_lo")).cast("double"),
            6,
        ).alias("value"),
    )


def _session_quantiles_oracle(gap_minutes: int = 60) -> str:
    """Oracle generated from the operator's gap (r12 — the
    _sessionize_oracle pattern)."""
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {gap_minutes * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, session_id,
         CAST(max(epoch_us(ts) // 1000000)
              - min(epoch_us(ts) // 1000000) AS BIGINT) AS duration_sec,
         count(*) AS n_events
  FROM (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts,
                                    event_id ROWS UNBOUNDED PRECEDING)
                    AS session_id
        FROM flagged)
  GROUP BY 1, 2),
m AS (
  SELECT 'duration_sec' AS metric, duration_sec AS v FROM sess
  UNION ALL
  SELECT 'n_events', n_events FROM sess),
hist AS (SELECT metric, v, count(*) AS cnt FROM m GROUP BY 1, 2),
h AS (
  SELECT metric, v,
         sum(cnt) OVER (PARTITION BY metric ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS c,
         sum(cnt) OVER (PARTITION BY metric) AS n
  FROM hist),
q AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct),
lo AS (
  SELECT metric, pct, min(v) AS v_lo
  FROM h, q WHERE c >= (n - 1) * pct // 100 + 1 GROUP BY 1, 2),
hi AS (
  SELECT metric, pct, min(v) AS v_hi
  FROM h, q WHERE c >= ((n - 1) * pct + 99) // 100 + 1 GROUP BY 1, 2),
nn AS (SELECT metric, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1)
SELECT lo.metric, lo.pct,
       round(CAST(v_lo AS DOUBLE)
             + (CAST((nn.n - 1) * lo.pct % 100 AS DOUBLE) / 100.0)
               * CAST(v_hi - v_lo AS DOUBLE), 6) AS value
FROM lo
JOIN hi ON lo.metric = hi.metric AND lo.pct = hi.pct
JOIN nn ON lo.metric = nn.metric
"""


SESSION_QUANTILES_ORACLE = _session_quantiles_oracle()


def orders_seasonality_decomposition(spark, sf_dir):
    """Classical ratio-to-moving-average seasonal decomposition of
    monthly order volume (the X-11 first pass): trend = centered 2×12
    moving average, ratio = count/trend, seasonal index = per-calendar-
    month mean ratio — "is August always slow, or is this year a dip".

    Exactness: monthly counts are integers; the 2×12 MA is the integer
    (c₋₆ + 2Σ₋₅..₊₅ + c₊₆)/24, carried as its exact numerator; ratios
    quantize to 1e-6 before the per-month mean (float means over years
    would sum in engine order). Scale shape: ONE fact shuffle to ~80
    month cells; every window/scan after runs on the month calendar."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.trunc("o_orderdate", "month").alias("m")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.orderBy("m")
    num = (
        F.lag("c", 6).over(w)
        + F.lead("c", 6).over(w)
        + sum(
            F.lag("c", k).over(w) if k > 0 else (F.lead("c", -k).over(w) if k < 0 else F.col("c") * F.lit(1))
            for k in range(-5, 6)
        )
        * F.lit(2)
    )
    t = monthly.select(
        "m",
        "c",
        F.month("m").alias("moy"),
        num.alias("t24"),  # 24·trend, exact integer (NULL at the edges)
    )
    ratio_fp = F.round(
        F.lit(1000000.0) * F.lit(24.0) * F.col("c").cast("double")
        / F.col("t24").cast("double")
    ).cast("bigint")
    r = t.withColumn("ratio_fp", F.when(F.col("t24").isNotNull(), ratio_fp))
    idx = r.filter(F.col("ratio_fp").isNotNull()).groupBy("moy").agg(
        F.sum("ratio_fp").alias("s"), F.count(F.lit(1)).alias("k")
    )
    out = r.join(idx, "moy", "left")
    return out.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "c",
        F.round(F.col("t24").cast("double") / F.lit(24.0), 6).alias("trend"),
        # ratio_fp is ALREADY integer millionths: emit the exact-int
        # division with no re-round (a round(x, 6) here can straddle
        # half-ties differently across engines)
        (F.col("ratio_fp").cast("double") / F.lit(1e6)).alias("ratio"),
        # half-up mean in INTEGER arithmetic — s/k lands on exact
        # x.5e-6 ties (k | 2s) where Spark/DuckDB round() disagree:
        # idx_fp = floor((s + k/2)/k) = (2s + k) div 2k, then one
        # exact division
        (
            F.expr("(2 * s + k) div (2 * k)").cast("double") / F.lit(1e6)
        ).alias("seasonal_idx"),
    )


SEASONALITY_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m, count(*) AS c
  FROM orders GROUP BY 1),
t AS (
  SELECT m, c, month(m) AS moy,
         lag(c, 6) OVER w + lead(c, 6) OVER w
           + 2 * (lag(c, 5) OVER w + lag(c, 4) OVER w + lag(c, 3) OVER w
                  + lag(c, 2) OVER w + lag(c, 1) OVER w + c
                  + lead(c, 1) OVER w + lead(c, 2) OVER w
                  + lead(c, 3) OVER w + lead(c, 4) OVER w
                  + lead(c, 5) OVER w) AS t24
  FROM monthly
  WINDOW w AS (ORDER BY m)),
r AS (
  SELECT *, CASE WHEN t24 IS NOT NULL THEN
         CAST(round(1000000.0 * 24.0 * CAST(c AS DOUBLE)
                    / CAST(t24 AS DOUBLE)) AS BIGINT) END AS ratio_fp
  FROM t),
idx AS (
  SELECT moy, CAST(sum(ratio_fp) AS BIGINT) AS s, count(*) AS k
  FROM r WHERE ratio_fp IS NOT NULL GROUP BY 1)
SELECT strftime(r.m, '%Y-%m') AS month, r.c,
       round(CAST(r.t24 AS DOUBLE) / 24.0, 6) AS trend,
       CAST(r.ratio_fp AS DOUBLE) / 1e6 AS ratio,
       CAST((2 * idx.s + idx.k) // (2 * idx.k) AS DOUBLE) / 1e6
         AS seasonal_idx
FROM r LEFT JOIN idx ON r.moy = idx.moy
"""


def order_fulfillment_latency(spark, sf_dir):
    """Order-to-last-shipment latency per order priority: order count,
    exact mean days, and the exact (lower) median days — the SLA /
    fulfillment-health rollup an ops dashboard runs hourly. Orders
    with no lineitems (257 exist in this data, see
    orders_open_backlog_daily) have no shipment and are excluded by
    the inner join — truthfully "never fulfilled", not latency 0.

    Scale shape: the per-order max-shipdate aggregate and the orders
    join are BOTH orderkey-grain (zero-exchange under the keyed cache
    pin; one orderkey shuffle cold); per-order rows then collapse to a
    (priority × latency-day) histogram — calendar-bounded ~5×2500
    cells — where the mean comes from Σ(lat·cnt)/Σcnt in exact integer
    algebra and the median is the order statistic over the cumulative
    window, never a per-row sort."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("d0"),
    )
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.to_date(F.max("l_shipdate")).alias("d1"))
    )
    lat = o.join(last_ship, o.o_orderkey == last_ship.l_orderkey).select(
        "o_orderpriority", F.datediff("d1", "d0").alias("lat")
    )
    hist = lat.groupBy("o_orderpriority", "lat").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wp = W.partitionBy("o_orderpriority")
    cum = (
        hist.withColumn(
            "cum", F.sum("cnt").over(wp.orderBy("lat"))
        )
        .withColumn("tot", F.sum("cnt").over(wp))
        .withColumn("s", F.sum(F.col("lat").cast("bigint") * F.col("cnt")).over(wp))
    )
    return cum.groupBy("o_orderpriority").agg(
        F.max("tot").alias("n_orders"),
        F.round(
            F.max("s").cast("double") / F.max("tot").cast("double"), 6
        ).alias("avg_days"),
        F.min(
            F.when(F.col("cum") * 2 >= F.col("tot"), F.col("lat"))
        ).cast("bigint").alias("p50_days"),
    )


FULFILLMENT_ORACLE = """
WITH ls AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS d1
            FROM lineitem GROUP BY 1),
lat AS (SELECT o_orderpriority,
               datediff('day', CAST(o_orderdate AS DATE), d1) AS lat
        FROM orders JOIN ls ON o_orderkey = l_orderkey),
hist AS (SELECT o_orderpriority, lat, count(*) AS cnt FROM lat GROUP BY 1, 2),
cum AS (SELECT o_orderpriority, lat, cnt,
               sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY lat
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY o_orderpriority) AS tot,
               sum(lat * cnt) OVER (PARTITION BY o_orderpriority) AS s
        FROM hist)
SELECT o_orderpriority, CAST(max(tot) AS BIGINT) AS n_orders,
       round(CAST(max(s) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6) AS avg_days,
       CAST(min(CASE WHEN 2 * cum >= tot THEN lat END) AS BIGINT) AS p50_days
FROM cum GROUP BY 1
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "order_fulfillment_latency",
        order_fulfillment_latency,
        FULFILLMENT_ORACLE,
    ),
    QuerySpec("events_gap_fill_locf", events_gap_fill_locf, GAP_FILL_ORACLE),
    QuerySpec(
        "session_length_quantiles",
        session_length_quantiles,
        SESSION_QUANTILES_ORACLE,
    ),
    QuerySpec(
        "orders_seasonality_decomposition",
        orders_seasonality_decomposition,
        SEASONALITY_ORACLE,
    ),
    QuerySpec(
        "orders_open_backlog_daily", orders_open_backlog_daily, OPEN_BACKLOG_ORACLE
    ),
    QuerySpec(
        "events_cusum_changepoint", events_cusum_changepoint, CUSUM_ORACLE
    ),
    QuerySpec(
        "events_seasonal_anomaly", events_seasonal_anomaly, SEASONAL_ANOMALY_ORACLE
    ),
    QuerySpec("events_dyadic_wma", events_dyadic_wma, DYADIC_WMA_ORACLE),
    QuerySpec(
        "interval_join_value_tiers", interval_join_value_tiers, INTERVAL_TIERS_ORACLE
    ),
    QuerySpec("events_rolling_zscore", events_rolling_zscore, ROLLING_ZSCORE_ORACLE),
    QuerySpec("trend_theil_sen", trend_theil_sen, THEIL_SEN_ORACLE),
]
