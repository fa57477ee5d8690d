"""Distributed exact rank assignment: ntile without the global sort.

`ntile(n) OVER (ORDER BY key)` with no PARTITION BY funnels the whole
frame through ONE task — the classic scale killer the round-8 verdict
flagged in `pareto_revenue_deciles` / `customer_rfm_segments`. The fix
is the histogram-rank pattern proven by `events_percentile_rank`
(operators/stats_tests.py): a row's global rank decomposes as

    rank(row) = #rows in strictly-smaller CELLS        (broadcast offset)
              + row_number within its own cell          (partition-parallel)

where a cell is a coarse quantization bucket of the sort key. The only
sequential scan left runs over the CELL HISTOGRAM (bounded ≤ ~65k rows
by construction), never the data; every row-grain step — the histogram
reduction (map-side combined), the offset pickup (broadcast join), the
within-cell row_number — is partition-parallel. The bucket number then
follows from the rank by ntile's closed form (first N mod n buckets get
one extra row).

Exactness: ties are broken by caller-supplied tie columns forming a
total order, and cell = floor(key/width) is monotone in key, so
(offset + intra-rank) reproduces the global ORDER BY rank bit-for-bit —
verified against `F.ntile().over()` in tests/test_ext_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _nullsafe_pickup(d: DataFrame, offs: DataFrame, keys: list[str]) -> DataFrame:
    """Broadcast offset pickup with NULL-SAFE key equality: a name-list
    equi-join is null-rejecting, so a NULL partition value (a perfectly
    legal group for the window semantics being reproduced) would
    silently DROP its rows from the output (r12 review)."""
    renamed = offs.select(
        *[F.col(c).alias(f"__o_{c}") for c in keys],
        *[c for c in offs.columns if c not in keys],
    )
    cond = None
    for c in keys:
        e = d[c].eqNullSafe(F.col(f"__o_{c}"))
        cond = e if cond is None else (cond & e)
    return d.join(F.broadcast(renamed), cond).drop(
        *[f"__o_{c}" for c in keys]
    )


def histogram_rank(
    df: DataFrame,
    key: Column,
    ties: list[Column],
    out: str = "rank",
    target_cells: int = 65536,
) -> tuple[DataFrame, int]:
    """(df + an `out` long column == row_number() OVER (ORDER BY key
    ASC, *ties), total row count) — the global rank, computed without a
    single-partition sort.

    `key` must be castable to long and non-null (negate it for DESC);
    `ties` must complete a total order (e.g. a unique id), ascending or
    descending Column expressions. One bounded 1-row collect fetches
    (min, max, count) to size the cell width — the same metadata-collect
    class as the ANN query-vector lookups."""
    d = df.withColumn("__key", key.cast("long"))
    mn, mx, total, n_keys = d.agg(
        F.min("__key"), F.max("__key"), F.count(F.lit(1)), F.count("__key")
    ).collect()[0]
    if total == 0:
        return df.withColumn(out, F.lit(None).cast("long")), 0
    if n_keys != total:
        # fail LOUD (r13 review): a NULL key would get a NULL cell and
        # the offset pickup's null-rejecting equi-join would silently
        # DROP the row while `total` still counted it — downstream
        # ntile bucket boundaries would then be wrong with no error.
        # Rides the same 1-row metadata collect; no extra action.
        raise ValueError(
            f"histogram_rank: {total - n_keys} NULL sort key(s); the "
            "key must be non-null (coalesce or filter upstream)"
        )
    width = (mx - mn) // target_cells + 1  # ≥ 1; ≤ target_cells+1 cells
    # integer div, not float floor: keys near 2^63 would lose exactness
    # through a double and could land a boundary row in the wrong cell
    d = d.withColumn("__cell", F.expr(f"(__key - {mn}L) div {width}L"))
    hist = d.groupBy("__cell").agg(F.count(F.lit(1)).alias("__cn"))
    offs = hist.select(
        "__cell",
        F.coalesce(
            F.sum("__cn").over(
                W.orderBy("__cell").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off"),
    )
    intra = F.row_number().over(
        W.partitionBy("__cell").orderBy(F.col("__key").asc(), *ties)
    )
    ranked = (
        d.join(F.broadcast(offs), "__cell")
        .withColumn(out, (F.col("__off") + intra).cast("long"))
        .drop("__key", "__cell", "__off")
    )
    return ranked, int(total)


def histogram_prefix_sum(
    df: DataFrame,
    key: Column,
    ties: list[Column],
    val: Column,
    out: str = "prefix",
    target_cells: int = 65536,
    parts: list[Column] | None = None,
) -> DataFrame:
    """df + an `out` long column == sum(val) OVER (PARTITION BY *parts
    ORDER BY key ASC, *ties ROWS UNBOUNDED PRECEDING) — the INCLUSIVE
    prefix sum, without a single-partition (or few-partition) sort. Same
    decomposition as histogram_rank with per-cell VALUE sums instead of
    counts: prefix(row) = Σval over strictly-smaller cells (broadcast
    offset) + running sum within its own cell (partition-parallel
    window). `parts` (default none = global order) scopes both terms to
    the partition — the low-cardinality-PARTITION BY case (e.g. 3
    returnflags) that would otherwise serialize the whole sort onto
    #parts tasks.

    `val` must be castable to long and non-null; overflow fails loud
    under ANSI. The cumulative scan runs over ≤ target_cells+1
    histogram rows per partition, never the data."""
    parts = list(parts or [])
    d = df.withColumn("__key", key.cast("long")).withColumn(
        "__val", val.cast("long")
    )
    pcols = []
    for i, p in enumerate(parts):
        d = d.withColumn(f"__p{i}", p)
        pcols.append(f"__p{i}")
    mn, mx = d.agg(F.min("__key"), F.max("__key")).collect()[0]
    if mn is None:
        return df.withColumn(out, F.lit(None).cast("long"))
    width = (mx - mn) // target_cells + 1
    d = d.withColumn("__cell", F.expr(f"(__key - {mn}L) div {width}L"))
    hist = d.groupBy(*pcols, "__cell").agg(F.sum("__val").alias("__cv"))
    offs = hist.select(
        *pcols,
        "__cell",
        F.coalesce(
            F.sum("__cv").over(
                W.partitionBy(*pcols)
                .orderBy("__cell")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off"),
    )
    intra = F.sum("__val").over(
        W.partitionBy(*pcols, "__cell")
        .orderBy(F.col("__key").asc(), *ties)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        _nullsafe_pickup(d, offs, [*pcols, "__cell"])
        .withColumn(out, (F.col("__off") + intra).cast("long"))
        .drop("__key", "__val", "__cell", "__off", *pcols)
    )


def histogram_ntile(
    df: DataFrame,
    key: Column,
    n: int,
    ties: list[Column],
    out: str = "bucket",
    target_cells: int = 65536,
) -> DataFrame:
    """df + an `out` int column == ntile(n) OVER (ORDER BY key ASC,
    *ties) — the rank from histogram_rank mapped through ntile's closed
    form (first N mod n buckets get one extra row)."""
    ranked, total = histogram_rank(df, key, ties, out="__r", target_cells=target_cells)
    if total == 0:
        return ranked.withColumnRenamed("__r", out).withColumn(
            out, F.lit(None).cast("int")
        )
    base, rem = divmod(int(total), n)
    if base == 0:
        # fewer rows than buckets: bucket i holds row i
        bucket = F.col("__r")
    else:
        bucket = F.when(
            F.col("__r") <= rem * (base + 1),
            F.expr(f"(__r + {base}) div {base + 1}"),
        ).otherwise(
            F.lit(rem) + F.expr(f"(__r - {rem * (base + 1)} + {base - 1}) div {base}")
        )
    return ranked.withColumn(out, bucket.cast("int")).drop("__r")
