"""tools/gen_sf.py invariants: the derived sfN directory must be a
valid instance of the same schema — exact row-count scaling and intact
referential integrity — or the sf1 bench (BENCH_SF1.md) measures a
different workload than the oracles compute. Pure DuckDB, no Spark."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def sf2_dir(tmp_path_factory):
    from gen_sf import gen

    out = str(tmp_path_factory.mktemp("sf_scaled"))
    gen(2, out)
    return out


def _one(con, sql):
    return con.execute(sql).fetchone()[0]


def test_row_counts_scale_exactly(sf2_dir):
    con = duckdb.connect()
    for t, factor in (
        ("region", 1), ("nation", 1),  # reference-fixed dims stay put
        ("customer", 2), ("supplier", 2), ("part", 2), ("orders", 2),
        ("lineitem", 2), ("events", 2), ("documents", 2), ("embeddings", 2),
    ):
        src = _one(con, f"SELECT count(*) FROM '/root/testdata/sf0.1/{t}.parquet'")
        dst = _one(con, f"SELECT count(*) FROM '{sf2_dir}/{t}.parquet'")
        assert dst == src * factor, (t, src, dst)


def test_referential_integrity_holds(sf2_dir):
    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf2_dir}/{t}.parquet'")
    checks = {
        "orders->customer": "SELECT count(*) FROM orders o LEFT JOIN customer c"
        " ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
        "lineitem->orders": "SELECT count(*) FROM lineitem l LEFT JOIN orders o"
        " ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL",
        "lineitem->part": "SELECT count(*) FROM lineitem l LEFT JOIN part p"
        " ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL",
        "lineitem->supplier": "SELECT count(*) FROM lineitem l LEFT JOIN supplier s"
        " ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL",
        "customer->nation": "SELECT count(*) FROM customer c LEFT JOIN nation n"
        " ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL",
    }
    for name, sql in checks.items():
        assert _one(con, sql) == 0, f"dangling keys: {name}"


def test_keys_stay_unique(sf2_dir):
    con = duckdb.connect()
    for t, k in (
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        dup = _one(
            con,
            f"SELECT count(*) FROM (SELECT {k} FROM '{sf2_dir}/{t}.parquet'"
            f" GROUP BY {k} HAVING count(*) > 1)",
        )
        assert dup == 0, f"{t}.{k} collides across shifted copies"
