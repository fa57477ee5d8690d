"""Static seed loading (SURVEY §2.1 S7, S6).

The reference loads an 8-row credit-card-ownership CSV as a dbt seed with
a declared schema (/root/reference/etl/dbtrisingwave/seeds/
credit_card_ownership.csv:1-9 and seeds/seeds.yml:1-10: card_id
varchar(8), client_id bigint). Here: ``spark.read.csv`` with an explicit
schema (never inferSchema in production paths), plus the same rows as an
in-memory source (S6, reference create_table.py:86-88 pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Same seed domain as the reference (card_123..card_789 + the late-arriving
# card_999 used by the backfill scenario, streaming-usecase.md:266-291).
OWNERSHIP_ROWS: list[tuple[str, int]] = [
    ("card_123", 123),
    ("card_234", 234),
    ("card_345", 345),
    ("card_456", 456),
    ("card_567", 567),
    ("card_678", 678),
    ("card_789", 789),
    ("card_999", 999),
]

OWNERSHIP_SCHEMA = T.StructType(
    [
        T.StructField("card_id", T.StringType(), False),
        T.StructField("client_id", T.LongType(), False),
    ]
)

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def seed_csv_path() -> str:
    """Materialize the seed CSV once (checked into the repo data dir)."""
    path = os.path.join(_DATA_DIR, "credit_card_ownership.csv")
    if not os.path.exists(path):
        os.makedirs(_DATA_DIR, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            f.write("card_id,client_id\n")
            for card, client in OWNERSHIP_ROWS:
                f.write(f"{card},{client}\n")
    return path


def credit_card_ownership(spark: SparkSession, from_csv: bool = True) -> DataFrame:
    """S7 CSV seed load with declared schema (or S6 in-memory rows)."""
    if from_csv:
        return (
            spark.read.option("header", True)
            .schema(OWNERSHIP_SCHEMA)
            .csv(seed_csv_path())
        )
    return spark.createDataFrame(OWNERSHIP_ROWS, OWNERSHIP_SCHEMA)
