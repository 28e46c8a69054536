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

--perturb: ALSO rewrite the similarity-bearing attributes per copy so
cross-copy twins stop being near-duplicates and TRUE pair counts stay
~linear in the copy count - the fixture that separates plan cost from
output growth for the near-dup rows (a bit-identical replica makes
their true result size quadratic in copies, drowning any plan
signal). The rewrites preserve WITHIN-copy structure exactly:
  - documents.text goes through a per-copy Caesar rotation of the
    letters (a bijection on characters): length, token boundaries,
    within-copy equalities and shingle Jaccards are untouched, so
    each copy reproduces the original pair set; cross-copy shingles
    share (almost) no tokens, so cross-copy pairs vanish.
  - embeddings.embedding gains a per-copy additive epsilon
    (copy * 1e-6 per component, float-rounded): breaks exact-vector
    twins and duplicate-centroid ties without moving any vector
    meaningfully (uniform SCALING would be invisible to cosine;
    the additive form is not).
Copy 0 is bit-identical in both modes, so the perturbed fixture's
rows are a superset-by-copy of the plain one.

Usage: python3 tools/mkscale.py /root/testdata/sf0.1 target/sf0.5 5 [--perturb]
"""
import sys, os, string
import duckdb

args = [a for a in sys.argv[1:] if a != "--perturb"]
perturb = "--perturb" in sys.argv[1:]
src, dst = args[0], args[1]
copies = int(args[2]) if len(args) > 2 else 5
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

def text_expr(c):
    """Per-copy letter rotation (identity for copy 0 / plain mode)."""
    if not perturb or c == 0:
        return "text"
    k = c % 25 + 1  # 1..25, never the identity rotation
    lo, up = string.ascii_lowercase, string.ascii_uppercase
    rot = lo[k:] + lo[:k] + up[k:] + up[:k]
    return f"translate(text, '{lo + up}', '{rot}') AS text"

def emb_expr(c):
    """Per-copy additive epsilon (identity for copy 0 / plain mode)."""
    if not perturb or c == 0:
        return "embedding"
    return (f"list_transform(embedding, x -> CAST(x + {c} * 0.000001 AS FLOAT))"
            " AS embedding")

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
     f"SELECT doc_id + {c*OD} AS doc_id, {text_expr(c)}, lang, source, "
     f"n_chars FROM '{src}/documents.parquet'", copies)
emit("embeddings", lambda c:
     f"SELECT vec_id + {c*OV} AS vec_id, {emb_expr(c)}, label "
     f"FROM '{src}/embeddings.parquet'", copies)
