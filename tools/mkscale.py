#!/usr/bin/env python3
"""Scale-robustness fixture builder: replicate the sf0.1 testdata N x
with key shifting into an sf0.5-equivalent directory, so the full
query surface + DuckDB oracle gate can run at a scale the driver does
not generate. Keys shift by copy*(max_key+1) per table, and foreign
keys shift by the SAME offsets, so uniqueness and referential
structure hold in every copy; attribute columns (text, embeddings,
timestamps, prices) are bit-identical replicas - which is exactly the
interesting case for the dedup/similarity families (every doc gains 4
exact twins) while remaining engine-agnostic: Spark and DuckDB read
the same files, so any disagreement is a real cross-engine bug, not a
fixture artifact.

Usage: python3 tools/mkscale.py /root/testdata/sf0.1 target/sf0.5 5
"""
import sys, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 5
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def off(table, key):
    return con.sql(
        f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

OC = off("customer", "c_custkey")
OS = off("supplier", "s_suppkey")
OP = off("part", "p_partkey")
OO = off("orders", "o_orderkey")
OE = off("events", "event_id")
OU = off("events", "user_id")
OD = off("documents", "doc_id")
OV = off("embeddings", "vec_id")

def emit(table, select_for_copy, ncopies):
    union = " UNION ALL ".join(select_for_copy(c) for c in range(ncopies))
    con.sql(f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# dimensions stay as-is (a 5x corpus does not grow its region list)
for dim in ("region", "nation"):
    emit(dim, lambda c, d=dim: f"SELECT * FROM '{src}/{d}.parquet'", 1)

emit("customer", lambda c:
     f"SELECT c_custkey + {c*OC} AS c_custkey, c_name, c_nationkey, "
     f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet'", copies)
emit("supplier", lambda c:
     f"SELECT s_suppkey + {c*OS} AS s_suppkey, s_name, s_nationkey, "
     f"s_acctbal FROM '{src}/supplier.parquet'", copies)
emit("part", lambda c:
     f"SELECT p_partkey + {c*OP} AS p_partkey, p_name, p_brand, p_type, "
     f"p_size, p_retailprice FROM '{src}/part.parquet'", copies)
emit("orders", lambda c:
     f"SELECT o_orderkey + {c*OO} AS o_orderkey, o_custkey + {c*OC} AS "
     f"o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
     f"o_orderpriority FROM '{src}/orders.parquet'", copies)
emit("lineitem", lambda c:
     f"SELECT l_orderkey + {c*OO} AS l_orderkey, l_partkey + {c*OP} AS "
     f"l_partkey, l_suppkey + {c*OS} AS l_suppkey, l_linenumber, "
     f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
     f"l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'", copies)
emit("events", lambda c:
     f"SELECT event_id + {c*OE} AS event_id, ts, user_id + {c*OU} AS "
     f"user_id, event_type, value, props FROM '{src}/events.parquet'",
     copies)
emit("documents", lambda c:
     f"SELECT doc_id + {c*OD} AS doc_id, text, lang, source, n_chars "
     f"FROM '{src}/documents.parquet'", copies)
emit("embeddings", lambda c:
     f"SELECT vec_id + {c*OV} AS vec_id, embedding, label "
     f"FROM '{src}/embeddings.parquet'", copies)
