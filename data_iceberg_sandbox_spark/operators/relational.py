"""Batch relational operators (SURVEY §2.1-2.5, §2.7 ✦ rows).

Every operator the reference exercises through its five engines,
re-expressed as stock DataFrame API so Catalyst gets the whole plan:
predicate pushdown, column pruning, broadcast selection and AQE come for
free. Reference citations per spec (files under /root/reference/).

Scale notes: filters/projections sit directly on the parquet scan
(PushedFilters visible in .explain); aggregations are hash-aggs with
map-side partial combine; the deliberately-small dims (region 5, nation
25 rows at any SF) are broadcast; ORDER BY ... LIMIT k compiles to
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.money import fixed, unscale
from ..sources.registry import load_table
from ..sources.seeds import OWNERSHIP_ROWS, credit_card_ownership
from .spec import QuerySpec

DEC = "decimal(18,4)"


def _t(name: str):
    def load(spark: SparkSession, sf_dir: str) -> DataFrame:
        return load_table(spark, sf_dir, name)

    return load


# --- §2.1 scans / sources -------------------------------------------------


def s1_scan_region(spark, sf_dir):
    """S1 full-table scan (infra/README.md:106)."""
    return load_table(spark, sf_dir, "region")


def s6_inmemory_rows(spark, sf_dir):
    """S6 in-memory rows → DataFrame with DDL-string schema
    (create_table.py:86-88), deterministic analog of the raw_clients
    generator (names/ages fixed instead of random)."""
    data = [
        (1, "Alice", 10),
        (2, "Bob", 34),
        (3, "Carol", 61),
        (4, "Dan", 45),
        (5, "Eve", 14),
        (6, "Frank", 72),
    ]
    return spark.createDataFrame(data, "id: long, name: string, age: int")


S6_ORACLE = """
SELECT * FROM (VALUES (1,'Alice',10),(2,'Bob',34),(3,'Carol',61),
                      (4,'Dan',45),(5,'Eve',14),(6,'Frank',72))
            AS t(id, name, age)
"""


def s7_csv_seed(spark, sf_dir):
    """S7 CSV seed load with declared schema (seeds/credit_card_ownership
    .csv:1-9, seeds.yml:1-10)."""
    return credit_card_ownership(spark, from_csv=True)


S7_ORACLE = "SELECT * FROM (VALUES {vals}) AS t(card_id, client_id)".format(
    vals=",".join(f"('{c}',{i})" for c, i in OWNERSHIP_ROWS)
)


# --- §2.2 projection / filter / scalar ------------------------------------


def p1_project_alias(spark, sf_dir):
    """P1 projection + aliasing (mv_fraud_alerts_client.sql:3-9)."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("client_id"),
        F.col("c_name").alias("client_name"),
        F.col("c_mktsegment").alias("segment"),
    )


P1_ORACLE = (
    "SELECT c_custkey AS client_id, c_name AS client_name,"
    " c_mktsegment AS segment FROM customer"
)


def p2_derived_chain(spark, sf_dir):
    """P2+P3+P4+P6 withColumn chain: CASE bucketing, arithmetic on a
    literal, column copy (create_table.py:46-60)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.withColumn(
            "category",
            F.when(F.col("c_acctbal") < 0, "debtor")
            .when(F.col("c_acctbal") < 5000, "standard")
            .otherwise("premium"),
        )
        .withColumn("birth_analog", F.lit(2025) - F.col("c_nationkey"))
        .withColumn("segment_copy", F.col("c_mktsegment"))
        .select("c_custkey", "category", "birth_analog", "c_mktsegment", "segment_copy")
    )


P2_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debtor'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS category,
       2025 - c_nationkey AS birth_analog,
       c_mktsegment,
       c_mktsegment AS segment_copy
FROM customer
"""


def p7_filter_eq(spark, sf_dir):
    """P7 equality filter (streaming-usecase.md:285-288)."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


P7_ORACLE = (
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'"
)


def p8_isnull_left_join(spark, sf_dir):
    """P8 IS NULL after left join — the orphan/backfill check
    (streaming-usecase.md:269-272): customers with no high-value
    (>300k) order. The unfiltered form ("customers with no orders") is
    EMPTY in this testdata at every SF — a vacuously-green hash match —
    while the price filter leaves a scale-invariant ~2% of customers
    orphaned (3/150 at sf0.001, 308/15000 at sf0.1)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select("c_custkey", "c_name")
    )


P8_ORACLE = """
SELECT c_custkey, c_name
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
     ON c_custkey = o_custkey
WHERE o_orderkey IS NULL
"""


def p9_range_filter(spark, sf_dir):
    """P9 comparison predicates (create_table.py:51-52; mv_fraud_alerts
    .sql:17)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") < 5) & (F.col("l_discount") > 0.05)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


P9_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem WHERE l_quantity < 5 AND l_discount > 0.05
"""


# --- §2.3 joins -----------------------------------------------------------


def j1_left_join(spark, sf_dir):
    """J1 left outer equi-join (mv_fraud_alerts_client.sql:13-14)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


J1_ORACLE = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def j2_two_hop_left_join(spark, sf_dir):
    """J2 enrichment chain: 3-table double left join
    (mv_fraud_alerts_client.sql:13-17); nation broadcast (25 rows)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select("o_orderkey", "c_name", F.col("n_name").alias("nation_name"))
    )


J2_ORACLE = """
SELECT o_orderkey, c_name, n_name AS nation_name
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            LEFT JOIN nation   ON c_nationkey = n_nationkey
"""


def j_inner(spark, sf_dir):
    """Inner equi-join (engine surface; reference joins are all left-outer,
    SURVEY §2.3 note)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return li.join(p, li.l_partkey == p.p_partkey, "inner").select(
        "l_orderkey", "l_linenumber", "p_name", "p_brand"
    )


J_INNER_ORACLE = """
SELECT l_orderkey, l_linenumber, p_name, p_brand
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def j_skew_salted(spark, sf_dir):
    """Skew-mitigated join as a driver-checkable query: the salted join
    (functions/skew.py — left side gets a random salt in [0, n), the
    build side is replicated n×, so one hot key spreads over n reducer
    partitions instead of stalling one task) must be BIT-EQUAL to the
    plain join — salting changes physical row routing, never content.
    AQE's skew-join split is the runtime fix; explicit salting is the
    deterministic fallback when a known hot key must never stall a
    stage at 100 TB.

    Bench framing: the sf10 coverage ratio (~11× the plain DuckDB
    join) is the deliberate price of the demonstration, not a plan
    defect — the build side replicates n_salts× (8 × 15M orders
    through the exchange at sf10) against a corpus whose orderkey is
    UNIFORM, i.e. worst case for salting overhead with zero skew to
    repay it. Production salts only the known-hot keys and plain-joins
    the rest; the uniform-key testdata makes that split vacuous here.
    The unsalted shape is benchmarked as `j1_left_join`/`tpch_q3`."""
    from ..functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


J_SKEW_ORACLE = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def j_semi(spark, sf_dir):
    """Left-semi join (EXISTS) — engine surface."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


J_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def j_anti(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — engine surface. Customers with no
    URGENT-priority order: an unfiltered anti against all orders is
    EMPTY in this testdata (every customer has orders at every SF), so
    it would pass the oracle vacuously; the priority filter keeps the
    result non-empty (~13% of customers) at all SFs. The filter lands
    on the build/right side BEFORE the anti join, so it also proves
    predicate pushdown through the anti path."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


J_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


# --- §2.4 aggregations ----------------------------------------------------


def a1_grouped_sum(spark, sf_dir):
    """A1 grouped SUM (mv_fraud_alerts.sql:3-15)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"))
    )


A1_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
"""


def a2_grouped_count(spark, sf_dir):
    """A2 grouped COUNT — clients per category (count_clients.py:59)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("category"))
        .agg(F.count("*").alias("len"))
    )


A2_ORACLE = (
    "SELECT c_mktsegment AS category, count(*) AS len"
    " FROM customer GROUP BY c_mktsegment"
)


def a3_having(spark, sf_dir):
    """A3 post-aggregation filter / HAVING (mv_fraud_alerts.sql:16-17)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast(DEC)).alias("_t"))
        .filter(F.col("_t") > 2000)
        .select("user_id", F.col("_t").cast("double").alias("total_value"))
    )


A3_ORACLE = """
SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
HAVING sum(CAST(value AS DECIMAL(18,4))) > 2000
"""


def a4_tumble_agg(spark, sf_dir):
    """A4/W1 tumbling event-time window aggregation (mv_fraud_alerts
    .sql:8-13; TUMBLE at streaming-usecase.md:42-46), batch form."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact scale-4 fixed point (functions/money.py): bit-equal
            # to the DECIMAL(18,4) oracle, codegen long fast path
            unscale(F.sum(fixed(F.col("value"), 4)), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


A4_ORACLE = """
SELECT date_trunc('minute', ts) AS window_start,
       date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2, 3
"""


def agg_stats(spark, sf_dir):
    """avg/min/max/count-distinct (engine surface, SURVEY §2.4 note).
    avg emitted as exact-decimal-sum / count — deterministic.

    Scale shape — the measured ladder (all sf10, 60M rows, DuckDB
    0.60 s): (a) native mixed agg plans Catalyst's Expand, fact
    duplicated 2× through the shuffle — 4.3 s (r12); (b) split with
    packed-long distinct — 3.8 s (r12); (c) split with the bitmap
    distinct helper — 3.15 s (r13); (d) THIS shape, one pass at
    (flag, 32k-key-bucket) grain where the exact distinct is a
    ``bitmap_construct_agg`` and every other aggregate is algebraic,
    so no Expand and ONE fact scan — 2.47 s, then 1.9 s with the
    scale-4 fixed-point quantity sum (r13). The bitmap leg
    forces ObjectHashAggregate (off whole-stage codegen) whichever
    side it sits on, which is why one pass beats codegen-split two:
    the scan, not codegen, is the dear term. Remaining ~4× vs DuckDB
    is the interpreted ObjectAgg update rate (~24M rows/s) — floor
    recorded with the four alternatives above. Shuffle: ~186 rows
    (3 flags × ~62 buckets), each a 4 KB bitmap.

    r14 optimization round closed the last untried shape: an
    Arrow-side distinct kernel (mapInArrow per-task numpy bitset +
    moments, merged by a 96-row applyInPandas) measured min-of-7
    13.42 s vs 1.94 s here (/tmp/ab_aggstats.json →
    OPTIMIZATION_r14.md) — the JVM→Arrow transpose of 60M rows is ~7×
    the whole bitmap aggregation. REJECTED; this floor argument now
    carries a measurement for every alternative family (split codegen,
    packed-long, Expand, Arrow kernel)."""
    li = load_table(spark, sf_dir, "lineitem")
    lvl1 = li.groupBy(
        "l_returnflag",
        F.expr("bitmap_bucket_number(l_partkey)").alias("__bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").alias(
            "__bm"
        ),
        # scale-4 fixed-point BIGINT (money.py): 3.0 s → 1.85 s at sf10
        # even off-codegen — long adds beat BigDecimal state either way
        F.sum(fixed(F.col("l_quantity"), 4)).alias("sq"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    return lvl1.groupBy("l_returnflag").agg(
        (unscale(F.sum("sq"), 4).cast("double") / F.sum("n")).alias(
            "avg_qty"
        ),
        F.min("mn").alias("min_price"),
        F.max("mx").alias("max_price"),
        F.sum(F.expr("bitmap_count(__bm)")).cast("long").alias("n_parts"),
        F.sum("n").cast("long").alias("n_rows"),
    ).select(
        "l_returnflag", "avg_qty", "min_price", "max_price", "n_parts", "n_rows"
    )


AGG_STATS_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def a_rollup(spark, sf_dir):
    """ROLLUP grouping sets (engine surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select("l_returnflag", "l_linestatus", "n")
    )


A_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- §2.5 window functions (OVER) -----------------------------------------


def w_rank_topk(spark, sf_dir):
    """row_number OVER (engine surface; reference-absent per SURVEY §2.5):
    top-3 customers by balance per segment. Unique tie-break on key."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


W_RANK_ORACLE = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) WHERE rn <= 3
"""


# --- §2.7 sort / limit / set ops ------------------------------------------


def l1_sort_limit(spark, sf_dir):
    """L1 LIMIT (streaming-usecase.md:75 etc.) behind a total order so the
    result set is deterministic → TakeOrderedAndProject physical op."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


L1_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def set_union(spark, sf_dir):
    """UNION + DISTINCT (engine surface)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


SET_UNION_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def set_except(spark, sf_dir):
    """EXCEPT (distinct semantics) — engine surface. Customer keys
    minus urgent-order placers: a nationkey-domain EXCEPT (the previous
    form) degenerates to EMPTY once both sides cover all 25 fixed
    nations — vacuous at sf0.1 already — while a key-domain difference
    stays a scale-invariant ~13% of customers at every SF."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


SET_EXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def s15_arrow_export(spark, sf_dir):
    """S15 client interchange (reference count_clients.py:14-16:
    ``scan().to_arrow()``). Round-trips ``nation`` through Arrow
    driver-side: DataFrame → ``toArrow()`` → an Arrow-side compute
    (``utf8_length`` per row, ``sum``/row-count checksums) → back in via
    ``createDataFrame``. The re-imported rows AND the Arrow-computed
    checksums are emitted as result columns, so a lossy export or import
    breaks the driver's value hash instead of passing silently.

    Scale note: Arrow export is deliberately a driver-side client
    surface (the reference's notebook path), sized to dimension tables —
    never a distributed-plan stage."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tbl = load_table(spark, sf_dir, "nation").toArrow()
    n_rows = tbl.num_rows
    key_sum = pc.sum(tbl.column("n_nationkey")).as_py()
    tbl = tbl.append_column(
        "name_len", pc.cast(pc.utf8_length(tbl.column("n_name")), pa.int64())
    )
    out = spark.createDataFrame(tbl)
    return out.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        "name_len",
        F.lit(n_rows).cast("long").alias("roundtrip_rows"),
        F.lit(key_sum).cast("long").alias("arrow_key_sum"),
    )


S15_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey,
       CAST(length(n_name) AS BIGINT) AS name_len,
       CAST((SELECT count(*) FROM nation) AS BIGINT) AS roundtrip_rows,
       CAST((SELECT sum(n_nationkey) FROM nation) AS BIGINT) AS arrow_key_sum
FROM nation
"""


SPECS: list[QuerySpec] = [
    QuerySpec("s1_scan_region", s1_scan_region, "SELECT * FROM region"),
    QuerySpec("s6_inmemory_rows", s6_inmemory_rows, S6_ORACLE),
    QuerySpec("s7_csv_seed", s7_csv_seed, S7_ORACLE),
    QuerySpec("p1_project_alias", p1_project_alias, P1_ORACLE),
    QuerySpec("p2_derived_chain", p2_derived_chain, P2_ORACLE),
    QuerySpec("p7_filter_eq", p7_filter_eq, P7_ORACLE),
    QuerySpec("p8_isnull_left_join", p8_isnull_left_join, P8_ORACLE),
    QuerySpec("p9_range_filter", p9_range_filter, P9_ORACLE),
    QuerySpec("j1_left_join", j1_left_join, J1_ORACLE),
    QuerySpec("j2_two_hop_left_join", j2_two_hop_left_join, J2_ORACLE),
    QuerySpec("j_inner", j_inner, J_INNER_ORACLE),
    QuerySpec("j_semi", j_semi, J_SEMI_ORACLE),
    QuerySpec("j_skew_salted", j_skew_salted, J_SKEW_ORACLE),
    QuerySpec("j_anti", j_anti, J_ANTI_ORACLE),
    QuerySpec("a1_grouped_sum", a1_grouped_sum, A1_ORACLE),
    QuerySpec("a2_grouped_count", a2_grouped_count, A2_ORACLE),
    QuerySpec("a3_having", a3_having, A3_ORACLE),
    QuerySpec("a4_tumble_agg", a4_tumble_agg, A4_ORACLE),
    QuerySpec("agg_stats", agg_stats, AGG_STATS_ORACLE),
    QuerySpec("a_rollup", a_rollup, A_ROLLUP_ORACLE),
    QuerySpec("w_rank_topk", w_rank_topk, W_RANK_ORACLE),
    QuerySpec("l1_sort_limit", l1_sort_limit, L1_ORACLE),
    QuerySpec("set_union", set_union, SET_UNION_ORACLE),
    QuerySpec("set_except", set_except, SET_EXCEPT_ORACLE),
    QuerySpec("s15_arrow_export", s15_arrow_export, S15_ORACLE),
]
