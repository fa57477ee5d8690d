"""Distributed deterministic data generation (SURVEY §2.2 P11 / §2.1 S6).

The reference generates load rows driver-side as Python lists of random
tuples (create_table.py:37-43: random.choice over 25 names, randint age,
200k rows per run). That shape collapses at scale — the generator must
be a Spark job: `spark.range(n)` partitions the id space across
executors and seeded column expressions derive deterministic
pseudo-random attributes per id. 10^11 rows generate exactly like 10^4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NAMES = [
    "Alice", "Bob", "Carol", "Dan", "Eve", "Frank", "Grace", "Heidi",
    "Ivan", "Judy", "Ken", "Laura", "Mallory", "Niaj", "Olivia", "Peggy",
    "Quentin", "Rupert", "Sybil", "Trent", "Uma", "Victor", "Wendy",
    "Xavier", "Zoro",
]


def generate_clients(
    spark: SparkSession,
    from_id: int,
    to_id: int,
    partitions: int | None = None,
) -> DataFrame:
    """The raw_clients generator as a distributed job: id-range →
    deterministic hash-derived name/age → the reference's derived-column
    chain (category buckets, birth year, audit timestamps;
    create_table.py:46-60). Same id always yields the same row."""
    if partitions is None:
        # Connect-safe (r13 review): .sparkContext raises on Connect
        try:
            partitions = spark.sparkContext.defaultParallelism
        except Exception:
            partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    rng = spark.range(from_id, to_id, 1, partitions)
    h = F.abs(F.xxhash64(F.col("id")))
    name = F.element_at(
        F.array(*[F.lit(n) for n in NAMES]), (h % len(NAMES) + 1).cast("int")
    )
    age = (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % 102 + 1).cast("int")
    return (
        rng.withColumn("name", name)
        .withColumn("age", age)
        .withColumn(
            "category",
            F.when(age < 15, "young").when(age < 60, "adult").otherwise("senior"),
        )
        .withColumn("birth", F.lit(2025) - age)
        .withColumn("created_at", F.current_timestamp())
        .withColumn("updated_at", F.col("created_at"))
    )
