#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
results written by graft.Verify, runs each oracle SQL in DuckDB over the
same testdata tables, and compares rows/schema/values (sorted by column
name, then row-sorted). Diagnostic only — not part of the library."""
import json, sys, glob, os
import duckdb

def load(outdir, sfdir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(outdir, sfdir):
    con = load(outdir, sfdir)
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISSING spark result: {name}"); fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ERROR  {name}: {e}"); fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA {name}: spark={list(g.columns)} duck={list(w.columns)}")
            fail += 1; continue
        if len(g) != len(w):
            print(f"ROWS   {name}: spark={len(g)} duck={len(w)}"); fail += 1; continue
        # value compare with dtype tolerance
        mism = None
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                import pandas as pd
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    bad = (a.astype(float) - b.astype(float)).abs() > 1e-9
                else:
                    bad = a.astype(str) != b.astype(str)
                if bad.any():
                    i = bad.idxmax()
                    mism = (c, a[i], b[i], int(bad.sum())); break
            except Exception as e:
                mism = (c, "cmp-error", str(e), -1); break
        if mism:
            print(f"VALUE  {name}: col={mism[0]} spark={mism[1]!r} duck={mism[2]!r} nbad={mism[3]}")
            fail += 1
        else:
            print(f"OK     {name} ({len(g)} rows)"); ok += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
