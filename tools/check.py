#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Loads each <out>/<name> parquet (Spark result), runs <out>/oracle_sql.json's
SQL in DuckDB over the fixture tables, sorts columns by name, and compares
values exactly (floats bit-exact; reports max-abs-diff when they differ).
"""
import json, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    n_pass = n_fail = n_weak = 0
    # A declared query with no dump means graft.Verify FAILED it (it logs
    # the error and moves on): silently comparing only the dirs present
    # turns a broken query into a smaller-but-green report. Only flag
    # when the dump looks unfiltered (a filtered Verify run dumps a
    # deliberate subset — don't fail those).
    declared = set(oracle)
    if len(names) >= len(declared) - len(declared) // 10:
        for name in sorted(declared - set(names)):
            print(f"  FAIL {name}: declared in oracle_sql.json but not dumped "
                  "(graft.Verify failed it — see its stderr)")
            n_fail += 1
    for name in names:
        spark_df = pd.read_parquet(f"{outdir}/{name}")
        if name not in oracle:
            print(f"  WEAK {name}: rows={len(spark_df)} (no oracle)")
            n_weak += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  FAIL {name}: oracle SQL error: {str(e).splitlines()[0][:150]}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"  FAIL {name}: columns spark={list(s.columns)} duck={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"  FAIL {name}: rows spark={len(s)} duck={len(o)}")
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                eq = (a == b) or (a is None and b is None)
                try:
                    if not eq and pd.isna(a) and pd.isna(b):
                        eq = True
                except (TypeError, ValueError):
                    pass
                if not eq:
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            n_fail += 1
            print(f"  FAIL {name}: {len(bad)}+ diffs, first: col={bad[0][0]} row={bad[0][1]} spark={bad[0][2]!r} duck={bad[0][3]!r}")
            fa, fb = bad[0][2], bad[0][3]
            if isinstance(fa, float) and isinstance(fb, float):
                print(f"         absdiff={abs(fa-fb):.3e}")
        else:
            # dtype sanity (warn only -- the driver may be stricter)
            dt_s, dt_o = [str(x) for x in s.dtypes], [str(x) for x in o.dtypes]
            note = "" if dt_s == dt_o else f"  [dtype s={dt_s} o={dt_o}]"
            print(f"  PASS {name}: rows={len(s)}{note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak/no-oracle ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
