#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Runs each oracle SQL in DuckDB over the same sf dir, loads the Spark
parquet dump from Verify, sorts columns by name, row-sorts both, and
hash-compares values. Usage: check.py <sfdir> <verify_outdir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = df.astype(str).values.tolist()
    rows.sort()
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()

def main(sfdir, outdir, only=None, skip=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # reject misspelled filter names up front: a typo'd --only would
    # otherwise filter the dict to empty and the gate would print
    # "0 ok, 0 fail" and exit 0 — a passing run that checked nothing.
    # Valid names = oracle keys UNION the run's registered query set
    # (registered_queries.json, written by Verify every run), so a
    # registered rows-only query (Verify output, no oracle) stays
    # skippable WITHOUT widening the guard to stale dump dirs left in
    # a reused outdir by renamed/removed queries. Older dumps without
    # the registry file fall back to dump dirs, with a warning.
    reg_file = f"{outdir}/registered_queries.json"
    if os.path.exists(reg_file):
        registered = set(json.load(open(reg_file)))
    else:
        registered = {os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                      if os.path.isdir(p)}
        print("WARNING: no registered_queries.json in outdir — validating "
              "filter names against dump dirs (stale dirs may pass)")
    unknown = ((only or set()) | (skip or set())) - (oracle.keys() | registered)
    if unknown:
        print(f"ERROR: unknown query name(s) in --only/--skip: {sorted(unknown)}")
        return 2
    excluded = set()
    if only:
        excluded |= {k for k in oracle if k not in only}
        oracle = {k: v for k, v in oracle.items() if k in only}
    if skip:
        for k in skip:
            oracle.pop(k, None)
        excluded |= set(skip)
        print(f"SKIPPED  {sorted(skip)} (excluded by --skip)")
    if not oracle:
        print("ERROR: --only/--skip left zero oracles to check")
        return 2
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    ok = fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}"); fail += 1; continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"SCHEMA   {name}: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            fail += 1; continue
        dt = [c for c in spark_df.columns
              if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if dt:  # dtype-strict: int32 vs int64 etc. would fail a strict driver
            print(f"DTYPE    {name}: " + ", ".join(
                f"{c} spark={spark_df[c].dtype} duck={duck_df[c].dtype}" for c in dt))
            fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}")
            fail += 1; continue
        hs, hd = canon(spark_df), canon(duck_df)
        if hs != hd:
            print(f"HASH     {name}")
            merged = spark_df.reindex(sorted(spark_df.columns), axis=1)
            dd = duck_df.reindex(sorted(duck_df.columns), axis=1)
            sa = sorted(merged.astype(str).values.tolist())
            sb = sorted(dd.astype(str).values.tolist())
            for a, b in zip(sa, sb):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}"); break
            fail += 1; continue
        print(f"OK       {name}"); ok += 1
    # rows-only queries (in Verify output but no oracle). Names the
    # caller excluded via --only/--skip are NOT rows-only — conflating
    # the two would make nonzero ROWSONLY (a gate signal: "registered
    # but unverified") fire on intentional exclusions.
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in excluded:
            continue
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWSONLY {name}: {n} rows")
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    # optional: --only a,b,c / --skip a,b,c (e.g. exclude oracles that
    # are quadratic in DuckDB at big scale-sweep SFs)
    def usage(msg):
        print(f"ERROR: {msg}\nusage: check.py <sfdir> <verify_outdir> "
              "[--only a,b,c] [--skip a,b,c]")
        sys.exit(2)
    only = skip = None
    args = sys.argv[1:]
    pos = []
    i = 0
    while i < len(args):
        if args[i] in ("--only", "--skip"):
            if i + 1 >= len(args):
                usage(f"{args[i]} requires a comma-separated value")
            names = set(args[i + 1].split(","))
            if args[i] == "--only":
                only = names
            else:
                skip = names
            i += 2
        else:
            pos.append(args[i]); i += 1
    if len(pos) != 2:
        usage(f"expected 2 positional args, got {len(pos)}")
    sys.exit(main(pos[0], pos[1], only, skip))
