"""AQE skew-join handling: a 90%-hot-key join must be split at runtime
(skew=true in the final adaptive plan) with results unchanged — the
no-manual-salting path the session factory enables."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        skewed = (
            spark.range(0, 200000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(
                    F.col("id") % 1000
                ),
            )
            .withColumn("pad", F.lpad(F.col("id").cast("string"), 64, "x"))
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k2"),
            F.lpad(F.col("id").cast("string"), 32, "y").alias("v"),
        )
        j = skewed.join(dim, skewed.k == dim.k2).select("id", "v")
        rows = j.collect()  # same QueryExecution → final adaptive plan below
        assert len(rows) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert re.search(r"skew=true", plan), "AQE must split the hot partition"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
