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


def test_replicated_docs_and_vectors_are_perturbed(sf2_dir):
    """Copies i>0 must not be verbatim clones (ADVICE r5: clone groups
    inflate dedup pair counts ~factor²) while the base copy i=0 stays
    byte-identical and cheap invariants hold: text length and vector
    norm are preserved by the cyclic rotations."""
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    n_docs = _one(con, f"SELECT count(*) FROM '{src}/documents.parquet'")
    base_same = _one(
        con,
        f"SELECT count(*) FROM '{src}/documents.parquet' s"
        f" JOIN '{sf2_dir}/documents.parquet' d USING (doc_id)"
        " WHERE s.text = d.text AND s.doc_id < 1e18",
    )
    assert base_same == n_docs  # copy 0 verbatim
    len_ok, identical = con.execute(
        f"SELECT count(*) FILTER (WHERE length(d.text) = length(s.text)),"
        f" count(*) FILTER (WHERE d.text = s.text)"
        f" FROM '{src}/documents.parquet' s"
        f" JOIN '{sf2_dir}/documents.parquet' d ON d.doc_id = s.doc_id + {n_docs}"
    ).fetchone()
    assert len_ok == n_docs  # rotation preserves length exactly
    # multi-word docs must differ; only 0/1-word docs may pass through
    multiword = _one(
        con,
        f"SELECT count(*) FROM '{src}/documents.parquet'"
        " WHERE len(string_split(text, ' ')) >= 2",
    )
    assert identical <= n_docs - multiword

    n_vec = _one(con, f"SELECT count(*) FROM '{src}/embeddings.parquet'")
    norm_delta, mean_cos, vec_identical = con.execute(
        f"SELECT max(abs(list_inner_product(s.embedding, s.embedding)"
        " - list_inner_product(d.embedding, d.embedding))),"
        " avg(abs(list_cosine_similarity(s.embedding, d.embedding))),"
        " count(*) FILTER (WHERE s.embedding = d.embedding)"
        f" FROM '{src}/embeddings.parquet' s"
        f" JOIN '{sf2_dir}/embeddings.parquet' d ON d.vec_id = s.vec_id + {n_vec}"
    ).fetchone()
    assert norm_delta < 1e-5  # rotation preserves the norm
    assert vec_identical == 0
    assert mean_cos < 0.3  # copies are decorrelated, not near-dups
