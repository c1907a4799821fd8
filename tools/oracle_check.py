#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
parquet dumps against DuckDB running oracle_sql.json over the same
testdata. Exact value compare (no float tolerance) — if this passes,
the driver's hash compare passes.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        except Exception as e:
            results[name] = f"READ FAIL: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL FAIL: {str(e)[:200]}"
            continue
        gs = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        es = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
        if sorted(got.columns) != sorted(exp.columns):
            results[name] = f"SCHEMA MISMATCH: {sorted(got.columns)} vs {sorted(exp.columns)}"
        elif len(gs) != len(es):
            results[name] = f"ROWCOUNT MISMATCH: {len(gs)} vs {len(es)}"
        else:
            diff_cols = []
            for c in gs.columns:
                a, b = gs[c], es[c].astype(gs[c].dtype) if gs[c].dtype != es[c].dtype else es[c]
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = (~eq).idxmax()
                    diff_cols.append(f"{c}[row{i}]: {a[i]!r} vs {b[i]!r}")
            results[name] = "OK" if not diff_cols else "VALUE MISMATCH: " + "; ".join(diff_cols[:3])
    npass = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for k, v in results.items():
        print(f"{'PASS' if v == 'OK' else 'INFO' if v.startswith('rows-only') else 'FAIL':4} {k}: {v}")
    print(f"== {npass}/{len(results)} ok")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
