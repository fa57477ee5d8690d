"""TPC-H-style analytical queries over the driver testdata.

The reference's interactive-SQL surface (Trino/spark-sql/PyIceberg,
SURVEY §3.3) is exercised here with the classic analytical shapes the
testdata's star schema supports — these are also the bench headliners.

Determinism: revenue expressions are exact fixed-point BIGINT sums
(functions/money.py — cents × milli-rates, whole-stage-codegen long
arithmetic; Spark's decimal-product sum leaves the primitive fast path
and measured ~2× slower). The DuckDB oracles keep the equivalent
bounded-precision DECIMAL formulation — price → DECIMAL(12,2),
discount/tax → DECIMAL(4,3) — and every query is hash-checked
bit-equal against it; the final cast to DOUBLE is the single lossy
step and is identical on both sides (exactness bounds in money.py).
q1's two-rate ``charge`` product would exceed the scale-5 BIGINT
headroom, so it pre-aggregates by the ~9 distinct tax classes in
BIGINT and combines the 54 per-class sums in DECIMAL — unbounded
headroom, negligible cost.

Scale notes: q1 is a 6-group hash agg → pure map-side combine; q3/q5/q10
join filtered fact partitions against dims (nation/region broadcast,
customer/orders shuffled on the join key with AQE); top-k uses
TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.money import fixed, unscale
from ..sources.registry import load_table
from .spec import QuerySpec

PRICE = "decimal(12,2)"
RATE = "decimal(4,3)"

# Data-scaled broadcast hints (customer/supplier/part subsets, which
# GROW with SF — unlike the reference-fixed nation/region folds) are
# valid only while the dim fits comfortably under driver/broadcast
# capacity. Shared probe + cap: functions/sizing.py (fail-closed).
from ..functions.sizing import BROADCAST_DIM_CAP_BYTES, path_bytes


def _dir_bytes(sf_dir, name):
    """On-disk size of a testdata table (file or directory parquet) —
    cheap driver-side stat used to gate data-scaled broadcast hints.
    Fails CLOSED via functions/sizing.path_bytes: a path the probe
    can't stat or walk (layout drift from sources/registry's
    `{name}.parquet` convention) reports +inf, so the size gate
    declines the broadcast in exactly the unknown-size case it exists
    to guard (r12 review — returning 0 force-applied the hint on a
    mis-stat)."""
    import os

    return path_bytes(os.path.join(sf_dir, f"{name}.parquet"))


def _bcast_if_small(df, sf_dir, table, cap_bytes=BROADCAST_DIM_CAP_BYTES):
    """Size-LADDERED join hint for a data-scaled dim subset (r13 gate,
    r14 middle tier):

    - under ``cap_bytes`` on disk → `F.broadcast` (the generalized q8
      fix — r11 flagged one forced customer broadcast; the same class
      sat at every q3/q5/q7/q9 dim site);
    - past the broadcast cap but under the per-build-partition bound →
      SHUFFLE_HASH: the dim becomes the shuffled build side, which
      skips SORTING the fact. Measured at sf100 q3 (600M-row lineitem,
      15M-row customer past the broadcast gate): SMJ 18.3–20.0 s vs
      SHJ 12.1 s steady-state, −35%. The bound scales with the session:
      64 MB on-disk per shuffle partition (~3× in memory per build
      task), so bigger clusters admit bigger dims — the per-task build
      stays constant;
    - past both → unhinted, AQE/SMJ (sort both sides, never OOM).

    The base-table size upper-bounds any filtered projection of it, so
    every tier of the gate is conservative — ON BYTES. It is NOT a
    safety proof for arbitrary frames: parquet under-states the
    in-memory LongHashedRelation of a narrow long-typed FACT frame by
    ~an order of magnitude (delta/dict encoding), and offering FULL
    orders as the build at sf100 (1.78 GB parquet, inside the 2 GB
    band) died with cannotAcquireMemoryToBuildLongHashedRelationError
    before one timed rep (r15, plans/r15/ab_q10q12_shj_rejected.json).
    Callers must offer only dims or genuinely-reduced fact frames
    (q3's ~20%-of-orders build measured −35% at sf100; q7's ~8% build
    adopted r15); full facts stay unhinted — SMJ sorts, never OOMs."""
    nbytes = _dir_bytes(sf_dir, table)
    if nbytes <= cap_bytes:
        return F.broadcast(df)
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if nbytes <= SHJ_BUILD_CAP_BYTES_PER_PARTITION * parts:
        return df.hint("SHUFFLE_HASH")
    return df


# 64 MB of parquet per build partition ≈ ~200 MB hashed in a task —
# bounded regardless of SF because shuffle_partitions scales with the
# cluster while the per-partition slice stays fixed.
SHJ_BUILD_CAP_BYTES_PER_PARTITION = 64 << 20


def _shj_if_medium(df, sf_dir, table, cap_bytes=BROADCAST_DIM_CAP_BYTES):
    """Middle-band-ONLY variant of the `_bcast_if_small` ladder for
    fact-derived frames (r15, VERDICT #6): SHUFFLE_HASH when the
    bounding table sits between the broadcast cap and the per-build-
    partition bound; NO hint otherwise. Rationale measured on q7
    (plans/r15/ab_q7_ladder.json): at sf100 the SHJ build on the
    reduced-orders frame skips sorting the 120M-row lineitem probe
    (min 6.04 vs 6.29 s, ahead in all three interleaved captures),
    but at sf≤0.1 the full ladder's BROADCAST tier fires and the extra
    broadcast-build job costs ~10–15 ms against a 0.17 s query whose
    SMJ already rides the pin's orderkey co-partitioning (1/9 pairs,
    min 0.183 vs 0.168 s) — so below the broadcast cap the frame stays
    unhinted and the plan is byte-identical to the pre-r15 one."""
    nbytes = _dir_bytes(sf_dir, table)
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if cap_bytes < nbytes <= SHJ_BUILD_CAP_BYTES_PER_PARTITION * parts:
        return df.hint("SHUFFLE_HASH")
    return df


def _disc_price_fixed():
    """Per-row revenue in exact scale-5 fixed point: cents × (1000 −
    discount-milli). BIGINT throughout → codegen long math; bounds in
    functions/money.py."""
    return fixed(F.col("l_extendedprice"), 2) * (
        F.lit(1000) - fixed(F.col("l_discount"), 3)
    )


def _sum_rev(alias: str):
    """Σ disc_price as the bit-identical DOUBLE of the decimal oracle."""
    return unscale(F.sum(_disc_price_fixed()), 5).alias(alias)


def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    # Two-level exact agg: the heavy pass groups by (flag, status, tax
    # class) — ~54 groups — with all sums in BIGINT fixed point; the
    # final pass applies the per-class (1000 + tax_milli) charge factor
    # in DECIMAL over those 54 rows (exact, unbounded headroom) and
    # recombines. charge = Σ_t (1000+t)·Σ_rows[t] cents·(1000−d) at
    # scale 8; the DECIMAL multiply-by-1e-8 shifts scale without
    # rounding, so the DOUBLE emit is the same single rounding as the
    # one-level decimal formulation the oracle runs.
    # Group the heavy 6M-row pass on ONE packed BIGINT key instead of
    # the two CHAR(1) strings: Spark's whole-stage-codegen fast hash map
    # (vectorized two-level map) only engages for primitive key types —
    # string keys fall back to the UnsafeRow hash map, measured 1.7×
    # slower on this exact shape at sf1 (0.234 s vs 0.139 s for the
    # minimal groupBy-sum). l_returnflag/l_linestatus are CHAR(1) by
    # TPC-H spec (flag ∈ {A,N,R}, status ∈ {F,O}); the 54-row regroup
    # reconstructs the strings with char(). A corpus that violated
    # CHAR(1) would merge/rename groups and hash-mismatch the oracle —
    # loud at the driver gate, never silent.
    pre = (
        li.groupBy(
            (F.ascii("l_returnflag") * 256 + F.ascii("l_linestatus")).alias("_fs"),
            fixed(F.col("l_tax"), 3).alias("_tm"),
        )
        .agg(
            F.sum(fixed(F.col("l_quantity"), 2)).alias("_sq"),
            F.sum(fixed(F.col("l_extendedprice"), 2)).alias("_sp"),
            F.sum(_disc_price_fixed()).alias("_sd"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    # Exact integer sum at scale 8, then cast-to-double + ONE division
    # by an exactly-representable 1e8 (the spec.py determinism
    # convention). The previous (× DECIMAL 1e-8).cast(double) emit
    # matched DuckDB at sf≤0.1 but drifted 1 ulp on one group at sf1:
    # decimal-scaled→double conversion paths differ between engines,
    # while integer→double is correctly rounded in both.
    charge_dec = F.sum(
        F.col("_sd").cast("decimal(28,0)") * (F.lit(1000) + F.col("_tm"))
    ).cast("double") / F.lit(1e8)
    return (
        pre.groupBy("_fs")
        .agg(
            unscale(F.sum("_sq"), 2).alias("sum_qty"),
            unscale(F.sum("_sp"), 2).alias("sum_base_price"),
            unscale(F.sum("_sd"), 5).alias("sum_disc_price"),
            charge_dec.alias("sum_charge"),
            (unscale(F.sum("_sq"), 2) / F.sum("_n")).alias("avg_qty"),
            (unscale(F.sum("_sp"), 2) / F.sum("_n")).alias("avg_price"),
            F.sum("_n").alias("count_order"),
        )
        .select(
            F.char(F.col("_fs") / 256).alias("l_returnflag"),
            F.char(F.col("_fs") % 256).alias("l_linestatus"),
            "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
            "avg_qty", "avg_price", "count_order",
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))
        * (CAST(1 AS DECIMAL(4,3)) + CAST(l_tax AS DECIMAL(4,3)))) AS DOUBLE)
    AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # Broadcast the segment-filtered customer dim into orders BEFORE the
    # orderkey shuffle: the exchange then carries ~1/5 of orders (and
    # only the three columns the agg needs) instead of the whole table.
    # Size-gated (r13): customer is data-scaled, so past the cap the
    # hint drops and AQE picks the join strategy.
    o_f = o.join(
        _bcast_if_small(c, sf_dir, "customer"), o.o_custkey == c.c_custkey
    ).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    # Group by l_orderkey ALONE: o_orderdate/o_orderpriority are
    # functionally dependent on it (order attributes), which Catalyst
    # cannot prove from a 3-column key — carried via first() instead,
    # the aggregate's required distribution is satisfied by the join's
    # orderkey partitioning and the per-group agg exchange disappears.
    # The fact-side join rides the same ladder, bounded by the base
    # `orders` table (o_f ⊆ orders): at sf100 this plans SHUFFLE_HASH
    # and skips sorting the 600M-row lineitem side (18.3–20.0 s SMJ →
    # 12.1 s, the helper's measured A/B).
    o_f = _bcast_if_small(o_f, sf_dir, "orders")
    return (
        li.join(o_f, li.l_orderkey == o_f.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.first("o_orderdate").alias("o_orderdate"),
            F.first("o_orderpriority").alias("o_orderpriority"),
            _sum_rev("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


Q3_ORACLE = """
SELECT l_orderkey,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE)
    AS revenue,
  o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def _inline_nations(spark, sf_dir, region_name: str | None = None):
    """Reference-fixed dims inlined at plan build: ``nation`` (25 rows)
    and ``region`` (5 rows) keep those cardinalities at EVERY scale
    factor (TPC-H spec; the driver's datagen mirrors it), so collecting
    them once while the plan is constructed — and memoized WITH the plan
    (spec.py `_memoized`) — and folding them into a literal IN-list plus
    a literal nationkey→name lookup map is scale-safe by construction.
    This is the map-side dimension join without its broadcast-build job:
    the bench floor decomposition showed each build is a whole
    per-action floor payment (~40-60 ms local) for a ≤25-row dim.
    Returns (sorted nationkeys, name dict, map column)."""
    n = load_table(spark, sf_dir, "nation")
    if region_name is not None:
        r = load_table(spark, sf_dir, "region").filter(
            F.col("r_name") == region_name
        )
        n = n.join(r, n.n_regionkey == r.r_regionkey)
    rows = sorted(
        n.select("n_nationkey", "n_name").collect(),
        key=lambda row: row["n_nationkey"],
    )
    keys = [row["n_nationkey"] for row in rows]
    names = {row["n_nationkey"]: row["n_name"] for row in rows}
    nmap = F.create_map(
        *[F.lit(x) for row in rows for x in (row["n_nationkey"], row["n_name"])]
    )
    return keys, names, nmap


def q5_local_supplier_volume(spark, sf_dir):
    """Revenue per nation where customer and supplier share the nation.
    nation⋈region fold into literal predicates (`_inline_nations`):
    6 jobs → 4, same bit-exact result vs the join-form oracle."""
    keys, _, nmap = _inline_nations(spark, sf_dir, region_name="ASIA")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(keys)
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(keys)
    )
    # Same scale lever as q7: broadcast the pruned dims into their facts
    # FIRST (orders is already date-filtered; the region's customers cut
    # it to a few %, the region's suppliers cut lineitem to ~1/5), THEN
    # shuffle-join the two reduced facts on orderkey with the
    # same-nation predicate riding on the join. Inner equi-joins
    # commute, so the result is unchanged; the orderkey exchange moves
    # ~10x fewer bytes.
    # Both dims are data-scaled → size-gated hints (r13).
    li_f = li.join(
        _bcast_if_small(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey
    ).select(
        "l_orderkey", "l_extendedprice", "l_discount", "s_nationkey"
    )
    o_f = o.join(
        _bcast_if_small(c, sf_dir, "customer"), o.o_custkey == c.c_custkey
    ).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        # Measured-and-rejected alternative (r13): joining on orderkey
        # ALONE with the same-nation equality as a post-join filter —
        # meant to let the pin's orderkey co-partitioning skip the
        # exchange — ran 1.9 s vs 1.3 s pinned at sf10: the exchange
        # was not eliminated either way, and the single-key join's
        # larger pre-filter output (~3.6M rows) made it strictly worse.
        # The two-key form below stands; its floor is the reduced-fact
        # orderkey SMJ itself.
        li_f.join(
            o_f,
            (li_f.l_orderkey == o_f.o_orderkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("c_nationkey")
        .agg(
            _sum_rev("revenue")
        )
        .select(F.element_at(nmap, F.col("c_nationkey")).alias("nation"), "revenue")
    )


Q5_ORACLE = """
SELECT n_name AS nation,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE)
    AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            unscale(
                F.sum(
                    fixed(F.col("l_extendedprice"), 2)
                    * fixed(F.col("l_discount"), 3)
                ),
                5,
            ).alias("revenue")
        )
    )


Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q10_returned_items(spark, sf_dir):
    """Top-20 customers by revenue lost to returns (l_returnflag='R').
    The nation name lookup folds to a literal map (`_inline_nations`):
    grouping moves to c_nationkey (1:1 with n_name), one fewer
    broadcast-build job, bit-exact vs the join-form oracle."""
    _, _, nmap = _inline_nations(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    # Top-k pushdown: the grouping keys (c_custkey, c_name, c_nationkey)
    # are 1:1 with o_custkey, so aggregate revenue by o_custkey and take
    # the top 20 (same tiebreak) BEFORE touching the customer table —
    # the name/nation lookup then joins 20 rows by broadcast instead of
    # dragging every customer's name through the shuffle and agg.
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(_sum_rev("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .limit(20)
    )
    return (
        c.join(F.broadcast(rev), rev.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.element_at(nmap, F.col("c_nationkey")).alias("nation"),
            "revenue",
        )
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name AS nation,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE)
    AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


SPECS: list[QuerySpec] = [
    QuerySpec("tpch_q1_pricing_summary", q1_pricing_summary, Q1_ORACLE),
    QuerySpec("tpch_q3_shipping_priority", q3_shipping_priority, Q3_ORACLE),
    QuerySpec("tpch_q5_local_supplier", q5_local_supplier_volume, Q5_ORACLE),
    QuerySpec("tpch_q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE),
    QuerySpec("tpch_q10_returned_items", q10_returned_items, Q10_ORACLE),
]
