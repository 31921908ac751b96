"""Deterministic scale-up of the driver's synthetic tables (no external
data): replicate sf0.1 by FACTOR with per-replica perturbations so the
scaled tables keep the statistical shape the queries expect without
creating degenerate 10x exact-duplicate explosions.

Per replica k (0 = identity):
- documents: doc_id*F+k; k>0 laces a DOC-SPECIFIC token (an md5(text)
  fragment indexed by k) between every token pair — variants of the
  same doc stop being near-dups of each other, and the laced token is
  unique per source text so it cannot create cross-doc similarity
  (a shared replica token would put a (lace, t, lace) shingle in every
  doc containing token t and explode the candidate-pair count);
  n_chars recomputed. Exact-dup groups replicate as parallel groups,
  preserving dedup structure at 10x size.
- embeddings: vec_id*F+k; embedding rolled by k positions (same norm,
  different direction).
- events: event_id*F+k; user_id offset by k*1e6 (new disjoint streams,
  same time range so windowed queries scale).
- orders/customer: keys offset so referential structure (and its
  violations) replicate per-replica.
- region/nation/part/supplier/lineitem: copied (unused by the gate).

Usage: python tools/synth_sf.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb


def synth(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"create view ks as select unnest(range({factor})) as k")

    def copy(sql: str, name: str) -> None:
        out = os.path.join(dst, f"{name}.parquet")
        con.execute(f"copy ({sql}) to '{out}' (format parquet)")
        n = con.execute(
            f"select count(*) from read_parquet('{out}')").fetchone()[0]
        print(f"  {name}: {n} rows")

    copy(f"""
        with v as (
            select d.*, ks.k,
                   case when ks.k = 0 then d.text
                        else replace(d.text, ' ',
                            ' ' || substr(md5(d.text), ks.k, 4) || ' ')
                   end as vtext
            from read_parquet('{src}/documents.parquet') d cross join ks
        )
        select doc_id * {factor} + k as doc_id, vtext as text,
               lang, source, length(vtext) as n_chars
        from v order by doc_id
    """, "documents")

    copy(f"""
        select e.vec_id * {factor} + ks.k as vec_id,
               list_concat(e.embedding[ks.k + 1:],
                           e.embedding[1:ks.k])::FLOAT[] as embedding,
               e.label
        from read_parquet('{src}/embeddings.parquet') e cross join ks
        order by vec_id
    """, "embeddings")

    copy(f"""
        select ev.event_id * {factor} + ks.k as event_id, ev.ts,
               ev.user_id + ks.k * 1000000 as user_id,
               ev.event_type, ev.value, ev.props
        from read_parquet('{src}/events.parquet') ev cross join ks
        order by event_id
    """, "events")

    copy(f"""
        select o.o_orderkey * {factor} + ks.k as o_orderkey,
               o.o_custkey + ks.k * 1000000 as o_custkey,
               o.o_orderstatus, o.o_totalprice, o.o_orderdate,
               o.o_orderpriority
        from read_parquet('{src}/orders.parquet') o cross join ks
        order by o_orderkey
    """, "orders")

    copy(f"""
        select c.c_custkey + ks.k * 1000000 as c_custkey,
               c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        from read_parquet('{src}/customer.parquet') c cross join ks
        order by c_custkey
    """, "customer")

    for t in ("region", "nation", "part", "supplier", "lineitem"):
        copy(f"select * from read_parquet('{src}/{t}.parquet')", t)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    synth(src, dst, factor)
    print(f"synthesized {dst} = {src} x {factor}")
