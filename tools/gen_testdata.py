"""Synthesize an sf1-equivalent warehouse from the driver's sf0.1 data.

The driver ships sf{0.001,0.01,0.1}; SCALING.md's caption concedes that
at sf0.1 (600k lineitem) fixed per-query overhead still dominates, so the
"scales linearly" claims rest on plan audits alone. This tool builds a
10x-larger warehouse (sf1: 6M lineitem, 1M events, 50k documents, 20k
embeddings) so at least one scale point exists where data cost is the
majority term.

Method: replicate each sf0.1 table 10x with key-space offsets that
preserve every join relationship (l_orderkey -> o_orderkey etc. get the
same per-replica stride), so the data distribution — selectivities, group
cardinalities per key, join fan-outs — matches sf0.1 exactly at 10x the
volume. Replica 0 is byte-identical to sf0.1: every sf0.1 query result is
a subset of its sf1 counterpart. Document text gets a per-replica suffix
token (replica > 0) so the near-dup structure stays per-replica instead
of creating artificial 10-way cross-replica duplicate clusters;
embeddings are scaled by (1 + replica*1e-4), which preserves cosine
geometry bit-for-bit in structure while keeping vec_ids unique.

Output: {out_dir}/ (default /root/repo/.scale/sf1 — gitignored, ~250 MB).
Run: PYTHONPATH=. python tools/gen_testdata.py [replicas] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DIMS = ("region", "nation")  # fixed-size dims: copied, not replicated


def stride(con: duckdb.DuckDBPyConnection, table: str, key: str) -> int:
    return con.execute(
        f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'"
    ).fetchone()[0]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
    )
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def copy_atomic(sql: str, t: str) -> None:
        # Write-then-rename: a killed run leaves a .tmp, never a 0-byte
        # or truncated table that a later probe silently reads (round-5
        # postmortem: an interrupted sf10 build left a 0-byte
        # lineitem.parquet that made the committed table irreproducible).
        tmp = f"{out_dir}/{t}.parquet.tmp"
        con.execute(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, f"{out_dir}/{t}.parquet")

    for t in DIMS:
        copy_atomic(f"SELECT * FROM '{SRC}/{t}.parquet'", t)
        print(f"  {t}: copied (dim)")

    s_cust = stride(con, "customer", "c_custkey")
    s_supp = stride(con, "supplier", "s_suppkey")
    s_part = stride(con, "part", "p_partkey")
    s_ord = stride(con, "orders", "o_orderkey")
    s_evt = stride(con, "events", "event_id")
    s_user = stride(con, "events", "user_id")
    s_doc = stride(con, "documents", "doc_id")
    s_vec = stride(con, "embeddings", "vec_id")

    # (table, select-template). {i} = replica index; key offsets use the
    # parent table's stride so FKs stay aligned across replicas.
    plans = {
        "customer": f"SELECT c_custkey + {{i}} * {s_cust} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'",
        "supplier": f"SELECT s_suppkey + {{i}} * {s_supp} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'",
        "part": f"SELECT p_partkey + {{i}} * {s_part} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'",
        "orders": (
            f"SELECT o_orderkey + {{i}} * {s_ord} AS o_orderkey, o_custkey + {{i}} * {s_cust} AS o_custkey, "
            f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'"
        ),
        "lineitem": (
            f"SELECT l_orderkey + {{i}} * {s_ord} AS l_orderkey, l_partkey + {{i}} * {s_part} AS l_partkey, "
            f"l_suppkey + {{i}} * {s_supp} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
            f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'"
        ),
        "events": (
            f"SELECT event_id + {{i}} * {s_evt} AS event_id, ts, user_id + {{i}} * {s_user} AS user_id, "
            f"event_type, value, props FROM '{SRC}/events.parquet'"
        ),
        # Per-replica token suffix rewrites EVERY word, so every shingle
        # differs across replicas: near-dup structure (and dedup result
        # cardinality) scales exactly 10x instead of creating artificial
        # 10-way cross-replica duplicate clusters whose pair count would
        # grow quadratically in the replica count.
        "documents": (
            f"SELECT doc_id + {{i}} * {s_doc} AS doc_id, "
            f"CASE WHEN {{i}} = 0 THEN text ELSE "
            f"array_to_string(list_transform(string_split(text, ' '), x -> x || 'r{{i}}'), ' ') END AS text, "
            f"lang, source, n_chars FROM '{SRC}/documents.parquet'"
        ),
        # Circular shift by replica index = an orthogonal transform applied
        # uniformly within the replica: intra-replica dot products (and so
        # the kNN/ANN structure) are preserved bit-for-bit in geometry,
        # while cross-replica cosines are ~random-vector autocorrelations —
        # no artificial exact twins across replicas.
        "embeddings": (
            f"SELECT vec_id + {{i}} * {s_vec} AS vec_id, "
            f"CASE WHEN {{i}} = 0 THEN embedding ELSE "
            f"list_concat(embedding[{{i}}+1:], embedding[:{{i}}]) END AS embedding, "
            f"label FROM '{SRC}/embeddings.parquet'"
        ),
    }

    for t, tmpl in plans.items():
        union = " UNION ALL ".join(tmpl.format(i=i) for i in range(replicas))
        copy_atomic(union, t)
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows ({replicas}x)")

    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
