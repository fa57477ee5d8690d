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
    """Copies i>0 must not be NEAR-dup clones of the base (ADVICE r5 +
    r6 follow-up: verbatim clones — and the earlier cyclic rotation,
    which preserves ~all 5-shingles — inflate dedup pair counts
    ~factor² in clone groups). The copy-keyed word replacement must
    drive cross-copy shingle Jaccard to ~0 while preserving word count;
    the base copy i=0 stays byte-identical; vector rotations preserve
    norms and all WITHIN-copy inner products exactly."""
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
    words_ok, identical = con.execute(
        f"SELECT count(*) FILTER (WHERE len(string_split(d.text, ' '))"
        "                         = len(string_split(s.text, ' '))),"
        f" count(*) FILTER (WHERE d.text = s.text)"
        f" FROM '{src}/documents.parquet' s"
        f" JOIN '{sf2_dir}/documents.parquet' d ON d.doc_id = s.doc_id + {n_docs}"
    ).fetchone()
    assert words_ok == n_docs  # word count preserved exactly
    assert identical == 0
    # the property that kills the factor² pair blowup: no 5-shingle of a
    # copy survives vs its base doc, so cross-copy Jaccard ~ 0
    max_j = con.execute(
        f"""WITH sh AS (SELECT doc_id % {n_docs} AS base, doc_id,
              list_distinct(list_transform(
                  range(greatest(len(string_split(text,' ')) - 4, 1)),
                  i -> array_to_string(string_split(text,' ')[i+1:i+5], ' ')
              )) AS s
            FROM '{sf2_dir}/documents.parquet'
            WHERE doc_id % {n_docs} IN (3, 17, 41)
              AND len(string_split(text, ' ')) >= 10)
        SELECT max(len(list_intersect(a.s, b.s))::DOUBLE
                   / len(list_distinct(list_concat(a.s, b.s))))
        FROM sh a JOIN sh b ON a.base = b.base AND a.doc_id < b.doc_id"""
    ).fetchone()[0]
    assert max_j is not None and max_j < 0.05

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
    # the uniform per-copy rotation preserves WITHIN-copy structure
    # exactly: cos(copy_i(u), copy_i(v)) == cos(u, v), so neardup /
    # semdedup pair counts scale linearly with factor
    within_delta = con.execute(
        f"""SELECT max(abs(
              list_cosine_similarity(s1.embedding, s2.embedding)
            - list_cosine_similarity(d1.embedding, d2.embedding)))
        FROM '{src}/embeddings.parquet' s1
        JOIN '{src}/embeddings.parquet' s2 ON s2.vec_id = s1.vec_id + 1
        JOIN '{sf2_dir}/embeddings.parquet' d1 ON d1.vec_id = s1.vec_id + {n_vec}
        JOIN '{sf2_dir}/embeddings.parquet' d2 ON d2.vec_id = s2.vec_id + {n_vec}
        WHERE s1.vec_id < 50"""
    ).fetchone()[0]
    assert within_delta < 1e-5
