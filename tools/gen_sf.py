"""Scale up the driver's testdata by key-shifted replication (VERDICT r3
item 6 / r4 item 6: "bench at sf1, show the spark/duckdb ratio falling
as data grows").

/root/testdata is read-only and ships sf<=0.1, so this derives sfN from
sf0.1 with N/0.1 key-shifted copies of every fact table: each copy's
keys are offset by copy_index * (max key + 1) of the referenced table,
so referential integrity (orders->customer, lineitem->orders/part/
supplier) holds exactly and every bench query + its DuckDB oracle runs
unchanged on the bigger directory. Dims nation/region keep their
reference-fixed cardinality (25/5, broadcast at any SF). Event
timestamps get +copy_index seconds so per-user event density grows
without creating pathological exact-tie runs.

Usage: python tools/gen_sf.py [factor] [out_dir]
  factor default 10 (sf0.1 -> sf1), out_dir default .scratch/sf1
DuckDB does the generation — columnar read + write, no Spark needed.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def gen(factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # Bounded-memory generation (r14): at factor 1000 the lineitem COPY
    # buffers the whole 600M-row output to preserve insertion order —
    # observed 85+ GB resident and climbing before the OOM killer would
    # hit. Row order in the generated parquet is immaterial (every bench
    # query and oracle is order-independent, hash-compare sorts), so let
    # DuckDB stream the COPY instead of buffering it, cap its memory,
    # and give the in-memory connection a spill directory (in-memory
    # DBs otherwise cannot offload at all).
    con.execute("SET preserve_insertion_order = false")
    con.execute(f"SET memory_limit = '{os.environ.get('GEN_SF_MEM', '24GB')}'")
    con.execute(f"SET temp_directory = '{os.path.join(out_dir, '.duck_tmp')}'")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    K = {
        t: con.execute(f"SELECT max({k}) + 1 FROM {t}").fetchone()[0]
        for t, k in (
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        )
    }
    copies = f"(SELECT unnest(range({factor})) AS i)"
    # `tbl.* REPLACE (...)` keeps the generator schema-agnostic: the
    # driver ships slimmed TPC-H columns and may reshape them again.
    shifted = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""SELECT customer.* REPLACE
            (c_custkey + i * {K['customer']} AS c_custkey)
            FROM customer, {copies}""",
        "supplier": f"""SELECT supplier.* REPLACE
            (s_suppkey + i * {K['supplier']} AS s_suppkey)
            FROM supplier, {copies}""",
        "part": f"""SELECT part.* REPLACE
            (p_partkey + i * {K['part']} AS p_partkey)
            FROM part, {copies}""",
        "orders": f"""SELECT orders.* REPLACE
            (o_orderkey + i * {K['orders']} AS o_orderkey,
             o_custkey + i * {K['customer']} AS o_custkey)
            FROM orders, {copies}""",
        "lineitem": f"""SELECT lineitem.* REPLACE
            (l_orderkey + i * {K['orders']} AS l_orderkey,
             l_partkey + i * {K['part']} AS l_partkey,
             l_suppkey + i * {K['supplier']} AS l_suppkey)
            FROM lineitem, {copies}""",
        "events": f"""SELECT events.* REPLACE
            (event_id + i * {K['events']} AS event_id,
             ts + i * INTERVAL 1 SECOND AS ts)
            FROM events, {copies}""",
        # Copies i>0 of documents/embeddings are deterministically
        # PERTURBED so that near-dup structure scales LINEARLY with the
        # corpus, the way a bigger crawl does. Verbatim replication (and
        # the earlier cyclic word rotation, which preserves ~all
        # 5-shingles of the circular word sequence — measured J=0.9 vs
        # the base copy) gives every doc `factor` near-clones, so dedup
        # pair counts grow ~factor² inside clone groups — a workload
        # shape no real corpus has, and one that turns any sfN dedup
        # bench into a quadratic pair-materialization contest.
        #
        # documents: copy i>0 replaces every word at position p with
        # (p-1) % 3 == i % 3 by a copy-keyed token. Any 5-gram contains
        # a replaced position, and replacement tokens differ per copy,
        # so cross-copy shingle Jaccard ~= 0 — while two ALIGNED base
        # docs (the driver's deliberate near-dup pairs) get identical
        # replacements at identical positions, so each copy contributes
        # its own version of every base near-dup pair: pairs scale
        # ~linearly with factor. Word count is preserved exactly.
        #
        # embeddings: copy i>0 cyclically rotates EVERY vector of the
        # copy by the same copy-derived offset — a permutation applied
        # uniformly preserves all within-copy inner products exactly
        # (norms, neardup/semdedup pair structure) while decorrelating
        # vectors across copies. Copy i=0 stays verbatim in both tables.
        "documents": f"""SELECT d.* EXCLUDE (i, w) REPLACE
            (doc_id + i * {K['documents']} AS doc_id,
             CASE WHEN i = 0 THEN text
                  ELSE array_to_string(list_transform(w, (x, p) ->
                      CASE WHEN (p - 1) % 3 = i % 3
                           THEN 'x' || (i * 131071 + p) % 999983
                           ELSE x END), ' ')
             END AS text)
            FROM (SELECT documents.*, i, string_split(text, ' ') AS w
                  FROM documents, {copies}) d""",
        # (the odd-copy sign flip keeps copies with colliding rotation
        # offsets — i and i+dims-1 — from being bit-identical clones;
        # a uniform flip mask per copy preserves within-copy inner
        # products and norms exactly)
        "embeddings": f"""SELECT e.* EXCLUDE (i, r) REPLACE
            (vec_id + i * {K['embeddings']} AS vec_id,
             CASE WHEN i = 0 OR len(embedding) < 2 THEN embedding
                  ELSE list_transform(
                      list_concat(embedding[r + 1:], embedding[1:r]),
                      (x, p) -> CASE WHEN i % 2 = 1 AND p % 2 = 1
                                THEN -x ELSE x END)
             END AS embedding)
            FROM (SELECT embeddings.*, i,
                         1 + (i * 11) % greatest(len(embedding) - 1, 1) AS r
                  FROM embeddings, {copies}) e""",
    }
    for t, sql in shifted.items():
        out = os.path.join(out_dir, f"{t}.parquet")
        # GEN_SF_RESUME=1: skip tables already fully written (non-empty
        # file that parses) — a big-factor run killed mid-table can
        # resume instead of re-paying the finished tables. The in-flight
        # casualty is a 0-byte/corrupt file, which fails the probe and
        # regenerates.
        if (
            os.environ.get("GEN_SF_RESUME")
            and os.path.exists(out)
            and os.path.getsize(out) > 0
        ):
            try:
                n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
                print(f"{t}: {n} rows (resumed, already complete)")
                continue
            except Exception:
                pass  # unreadable → regenerate
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1",
    )
    gen(factor, out)
