#!/usr/bin/env python3
"""Generate a deterministic sf1 dataset (10x sf0.1) for scale evidence.

Usage: python3 tools/gen_sf1.py [<src_sf_dir> <out_dir>]
       (defaults: /root/testdata/sf0.1 -> testdata-sf1)

Ten referentially-consistent copies c = 0..9 of the source tables; copy 0
is the identity, so sf0.1 is a subset of sf1. Design choices, so that
scaling the data scales the WORKLOAD rather than degenerating it:

- every entity key k remaps to k*10 + c on BOTH sides of each FK
  (orders.custkey references copy-c customers, lineitem references copy-c
  orders/parts/suppliers, events clone per-user timelines) — each copy is
  a closed world, so join selectivities and per-user/per-order
  cardinalities are preserved while totals grow 10x;
- dimension tables (region, nation) stay fixed — scale factors grow
  facts, not geography;
- timestamps are NOT shifted: 10x rows in the same date range = 10x
  daily density, the TPC-H scaling convention (this is what makes the
  output-volume queries' superlinear curves measurable);
- document tokens get a per-copy suffix (copy 0 untouched), so texts are
  NOT near-duplicates across copies: the dedup/cluster structure
  replicates 10x (linear) instead of every doc becoming a 10-way
  cross-copy duplicate cluster (which would measure a different problem);
- embeddings get a small deterministic per-(copy, dim) offset, so copies
  are neither identical nor colinear — ANN top-k stays non-degenerate.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "testdata-sf1"
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
con.execute("CREATE TABLE copies AS SELECT unnest(generate_series(0, 9)) AS c")


def gen(table: str, select_sql: str, fanout: bool = True) -> None:
    frm = f"read_parquet('{src}/{table}.parquet')" + \
        (", copies" if fanout else "")
    con.execute(
        f"COPY (SELECT {select_sql} FROM {frm}) TO '{out}/{table}.parquet' "
        f"(FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
    ).fetchone()[0]
    print(f"  {table}: {n} rows")


gen("region", "*", fanout=False)
gen("nation", "*", fanout=False)
gen("customer",
    "c_custkey * 10 + c AS c_custkey, c_name, c_nationkey, c_acctbal, "
    "c_mktsegment")
gen("supplier", "s_suppkey * 10 + c AS s_suppkey, s_name, s_nationkey, "
    "s_acctbal")
gen("part", "p_partkey * 10 + c AS p_partkey, p_name, p_brand, p_type, "
    "p_size, p_retailprice")
gen("orders",
    "o_orderkey * 10 + c AS o_orderkey, o_custkey * 10 + c AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("lineitem",
    "l_orderkey * 10 + c AS l_orderkey, l_partkey * 10 + c AS l_partkey, "
    "l_suppkey * 10 + c AS l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    "l_shipdate")
gen("events",
    "event_id * 10 + c AS event_id, ts, user_id * 10 + c AS user_id, "
    "event_type, value, props")
gen("documents",
    "doc_id * 10 + c AS doc_id, "
    "CASE WHEN c = 0 THEN text ELSE array_to_string(list_transform("
    "  string_split(text, ' '), t -> t || 'x' || c), ' ') END AS text, "
    "lang, source, "
    "CAST(length(CASE WHEN c = 0 THEN text ELSE array_to_string("
    "  list_transform(string_split(text, ' '), t -> t || 'x' || c), ' ') "
    "END) AS BIGINT) AS n_chars")
gen("embeddings",
    "vec_id * 10 + c AS vec_id, "
    "CAST(list_transform(generate_series(1, len(embedding)), "
    "  i -> embedding[i] + ((c * (i + 6)) % 13 - 6) * 0.01) "
    "AS FLOAT[]) AS embedding, label")
print(f"wrote {out}")
