"""Salted-join equivalence + the spark.sql catalog DDL surface
(SURVEY §2.8 D1/D3/D4)."""

from __future__ import annotations

from data_iceberg_sandbox_spark.functions.skew import salted_join
from data_iceberg_sandbox_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    salted = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_sql_ddl_namespace_and_table(spark):
    """D1/D3/D4: CREATE NAMESPACE / CREATE TABLE / SHOW via spark.sql on
    the session catalog (the engine's interactive-DDL surface; the
    Iceberg catalog takes over when its jar is present)."""
    spark.sql("CREATE NAMESPACE IF NOT EXISTS finance")
    spark.sql("DROP TABLE IF EXISTS finance.products")
    spark.sql(
        "CREATE TABLE finance.products (id INT, description STRING, price DOUBLE)"
        " USING parquet"
    )
    spark.sql(
        "INSERT INTO finance.products VALUES"
        " (0,'Product 1',8.95),(1,'Product 2',17.95),(2,'Product 3',10.0)"
    )
    dbs = [r[0] for r in spark.sql("SHOW DATABASES").collect()]
    assert "finance" in dbs
    tables = [r["tableName"] for r in spark.sql("SHOW TABLES IN finance").collect()]
    assert "products" in tables
    rows = spark.sql(
        "SELECT * FROM finance.products ORDER BY id"
    ).collect()
    assert [r["description"] for r in rows] == ["Product 1", "Product 2", "Product 3"]
    # D5: schema evolution on the SQL surface
    spark.sql("ALTER TABLE finance.products ADD COLUMN cost DOUBLE")
    assert "cost" in spark.table("finance.products").columns
    spark.sql("DROP TABLE finance.products")
    spark.sql("DROP NAMESPACE finance")
