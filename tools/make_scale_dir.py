#!/usr/bin/env python
"""Derive an N× scale dir from a driver testdata dir (TESTDATA.md is
read-only; scaling experiments need bigger corpora than sf0.1).

Construction goals — CLEAN scaling ratios, not a stress corpus (the
round-6 LSH stress replica deliberately made replicas mutual near-dups;
this tool does the opposite):

- Every fact table is replicated N× with CONSISTENT key shifts
  (lineitem.l_orderkey moves with orders.o_orderkey, o_custkey with
  c_custkey, …), so join fan-outs, group cardinalities per key, and
  per-user event timelines are preserved exactly — the corpus gets more
  orders/users/docs, not deeper ones. Dims (region, nation) are copied.
- documents: replica 0 keeps the original text; replicas >= 1 apply an
  INJECTIVE per-replica token remap (every word w becomes w‡r). A
  shingle match within replica r then exists iff the corresponding
  match exists in the base corpus (near-dup pair structure replicates
  EXACTLY 1:1), and no shingle matches across replicas (disjoint
  vocabularies — which is also how a genuinely 10× corpus behaves:
  more vocabulary, not denser duplication). Word counts and order are
  preserved; word lengths grow by the 2-3 char tag; n_chars is
  recomputed. (First attempt used a canonical hash-sorted word order
  instead — REJECTED: canonical ordering turned every similar-vocab
  doc pair into a near-dup, densifying candidates ~500× and making
  scaling ratios unreadable.)
- embeddings: ids shift; vectors get a tiny deterministic per-replica
  additive offset so cross-replica rows are not bit-equal.
- Id discipline: doc ids are BLOCK-REMAPPED into [0, 100000) mod
  300000 (see the inline comment at the documents emit) so that
  corpus()'s +100000/+200000 derived-dedup copies stay collision-free
  at ANY replication factor — the identity below 100k docs. Large
  derived dirs exceed catalog.EDGE_ID_FLOOR (doc pairing in
  eval-rouge) — a bench-only artifact, documented in SCALE.md. (The
  other artifact this note used to carry — dedup-incr-persist's fixed
  doc < 200000 batch/index split — was fixed in round 12: both
  incremental-dedup splits now key on the replica class
  (doc % 300000), SF-invariant by construction.)

Usage: python tools/make_scale_dir.py [src_dir] [dst_dir] [N]
Defaults: /root/testdata/sf0.1 → ./.scale/sf1.0, N=10.
"""

from __future__ import annotations

import os
import sys

import duckdb


def _max(con: duckdb.DuckDBPyConnection, src: str, table: str, col: str) -> int:
    return con.execute(
        f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


def build(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # Guard the construction invariants against a testdata regen (code
    # review): a whitespace-only doc would gain a phantom '‡r' token in
    # replicas >= 1 (regexp_split_to_array(trim(''), ..) yields ['']),
    # and a NULL user_id + r*stride stays NULL, collapsing all N
    # replicas into one N-times-deeper timeline — either silently
    # breaks the 'structure replicates 1:1' claim the scaling ratios
    # rest on. Fail loud instead.
    n_degenerate_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/documents.parquet') "
        f"WHERE text IS NULL OR len(trim(text)) = 0"
    ).fetchone()[0]
    assert n_degenerate_docs == 0, (
        f"{n_degenerate_docs} empty/whitespace docs in {src}: the token "
        "remap would not replicate their structure 1:1 — exclude or "
        "handle them before scaling"
    )
    n_null_users = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/events.parquet') "
        f"WHERE user_id IS NULL"
    ).fetchone()[0]
    assert n_null_users == 0, (
        f"{n_null_users} NULL-user events in {src}: key shifting keeps "
        "them NULL, densifying one timeline N-fold instead of "
        "replicating — exclude or handle them before scaling"
    )
    reps = f"(SELECT unnest(range({n})) AS r) reps"

    def emit(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {rows} rows")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    cust = _max(con, src, "customer", "c_custkey") + 1
    supp = _max(con, src, "supplier", "s_suppkey") + 1
    part = _max(con, src, "part", "p_partkey") + 1
    okey = _max(con, src, "orders", "o_orderkey") + 1
    evt = _max(con, src, "events", "event_id") + 1
    user = _max(con, src, "events", "user_id") + 1
    doc = _max(con, src, "documents", "doc_id") + 1
    vec = _max(con, src, "embeddings", "vec_id") + 1

    emit("customer", f"""
        SELECT c_custkey + r * {cust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{src}/customer.parquet'), {reps}""")
    emit("supplier", f"""
        SELECT s_suppkey + r * {supp} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM read_parquet('{src}/supplier.parquet'), {reps}""")
    emit("part", f"""
        SELECT p_partkey + r * {part} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM read_parquet('{src}/part.parquet'), {reps}""")
    emit("orders", f"""
        SELECT o_orderkey + r * {okey} AS o_orderkey,
               o_custkey + r * {cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet'), {reps}""")
    emit("lineitem", f"""
        SELECT l_orderkey + r * {okey} AS l_orderkey,
               l_partkey + r * {part} AS l_partkey,
               l_suppkey + r * {supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet'), {reps}""")
    emit("events", f"""
        SELECT event_id + r * {evt} AS event_id, ts,
               user_id + r * {user} AS user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet'), {reps}""")
    # Block remap for doc ids (round 11 — the sf10 containment OOM's
    # root cause): queries/pipeline.corpus() maps id -> {{id, id+100000,
    # id+200000}}, so injectivity requires every base id to sit in
    # [0, 100000) MOD 300000. A contiguous derived range (sf10: 0..500k)
    # violates that — base docs COLLIDED with the shifted copies, merging
    # unrelated replicas' texts under one id, silently breaking the
    # 'structure replicates 1:1' claim and exploding the containment
    # candidate space (>78 GB of sort spill at sf10). The remap
    # (raw DIV 100000)*300000 + raw%100000 is the identity below 100k
    # (sf1.0 output byte-identical) and keeps the three corpus() images
    # pairwise disjoint at ANY N. Known artifact: fixed-id-window
    # queries (dedup-incr-persist's 200000 split) see a different
    # batch/index mix above 100k docs — documented in SCALE.md.
    doc_expr = f"((doc_id + r * {doc}) // 100000) * 300000 + ((doc_id + r * {doc}) % 100000)"
    emit("documents", f"""
        SELECT {doc_expr} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                      list_transform(
                        regexp_split_to_array(trim(text), '\\s+'),
                        w -> w || chr(8225) || CAST(r AS VARCHAR)),
                      ' ')
               END AS text,
               lang, source,
               CASE WHEN r = 0 THEN n_chars
                    ELSE CAST(len(array_to_string(
                      list_transform(
                        regexp_split_to_array(trim(text), '\\s+'),
                        w -> w || chr(8225) || CAST(r AS VARCHAR)),
                      ' ')) AS BIGINT)
               END AS n_chars
        FROM read_parquet('{src}/documents.parquet'), {reps}""")
    n_colliding = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet') "
        f"WHERE doc_id % 300000 >= 100000"
    ).fetchone()[0]
    assert n_colliding == 0, (
        f"{n_colliding} doc ids outside [0,100000) mod 300000: corpus()'s "
        "+100000/+200000 copies would collide with base docs"
    )
    emit("embeddings", f"""
        SELECT vec_id + r * {vec} AS vec_id,
               list_transform(embedding,
                              x -> CAST(x + r * 0.01 AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{src}/embeddings.parquet'), {reps}""")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scale", "sf1.0"
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, os.path.abspath(dst), n)
