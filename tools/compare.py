#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB over the same testdata,
compare schema/rowcount/values (columns sorted by name, rows sorted).
Usage: compare.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    resdir = os.path.join(outdir, name)
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(resdir + "/*.parquet")],
                        ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}"); fails += 1; continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    for c in sorted(got.columns):
        if str(got[c].dtype) != str(exp[c].dtype):
            print(f"  WARN {name}.{c}: dtype {got[c].dtype} vs {exp[c].dtype}")
    g, e = canon(got), canon(exp)
    # value compare with dtype normalization
    mismatch = None
    for c in g.columns:
        gc, ec = g[c], e[c]
        try:
            if gc.dtype.kind in "fc" or ec.dtype.kind in "fc":
                import numpy as np
                if not np.allclose(gc.astype(float), ec.astype(float),
                                   rtol=0, atol=0, equal_nan=True):
                    mismatch = c; break
            else:
                if not (gc.astype(str).values == ec.astype(str).values).all():
                    mismatch = c; break
        except Exception as ex:
            mismatch = f"{c} ({ex})"; break
    if mismatch:
        print(f"FAIL {name}: value mismatch in column {mismatch}")
        bad = (g[mismatch].astype(str).values != e[mismatch].astype(str).values) \
            if not isinstance(mismatch, str) or "(" not in str(mismatch) else None
        try:
            idx = (g[mismatch] != e[mismatch])
            print("  spark:", g[idx][:3].to_dict("records"))
            print("  duck :", e[idx][:3].to_dict("records"))
        except Exception:
            pass
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} PASS")
sys.exit(1 if fails else 0)
