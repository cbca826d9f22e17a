#!/usr/bin/env python3
"""Local correctness pre-check: replay the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <outDir>/<query> parquet (Spark output) and runs the matching
SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir tables.
Compares: column name sets, row counts, and values (columns sorted by
name, rows sorted by all columns, exact compare with a tiny float report).

With [jsonOut], also writes a per-query correctness record in the
CORRECTNESS_rN schema ({query: {rows, schema, hash, err}}) so the round
is self-evidencing even when the driver-side artifact lands empty
(r14's CORRECTNESS_r14.json was a 2-byte `{}` — see VERDICT r14 #1).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize decimals/objects to comparable forms
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, 'as_tuple') else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir, jsonout=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    record = {}

    def rec(name, rows_match, schema_match, hash_match, sr, orr, err):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": sr,
                        "oracle_rows": orr, "err": err}

    for name, sql in sorted(oracle.items()):
        pdir = f"{outdir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}")
            rec(name, False, False, False, None, None, "no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            rec(name, False, False, False, None, None, str(e)[:300])
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns got={sorted(got.columns)} exp={sorted(exp.columns)}")
            rec(name, len(got) == len(exp), False, False, len(got), len(exp), "column mismatch")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            rec(name, False, True, False, len(got), len(exp), "row count mismatch")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
                ga = g.astype(float).to_numpy()
                ea = e.astype(float).to_numpy()
                both_nan = np.isnan(ga) & np.isnan(ea)
                neq = ~both_nan & (ga != ea)
                if neq.any():
                    i = int(np.argmax(neq))
                    mx = np.nanmax(np.abs(np.where(both_nan, 0, ga - ea)))
                    diffs.append(f"col {c}: {int(neq.sum())} diffs, maxabs={mx:.3e}, first@{i}: {ga[i]!r} vs {ea[i]!r}")
            else:
                ge = g.astype(str).to_numpy()
                ee = e.astype(str).to_numpy()
                neq = ge != ee
                if neq.any():
                    i = int(np.argmax(neq))
                    diffs.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {ge[i]!r} vs {ee[i]!r}")
        if diffs:
            print(f"FAIL {name}: " + " | ".join(diffs))
            rec(name, True, True, False, len(got), len(exp), " | ".join(diffs)[:300])
            n_fail += 1
        else:
            # flag dtype mismatches even when values match
            dt = [f"{c}:{got[c].dtype}/{exp[c].dtype}" for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
            note = f"  [dtype note: {', '.join(dt)}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}")
            rec(name, True, True, True, len(got), len(exp), None)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if jsonout:
        with open(jsonout, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {jsonout} ({len(record)} queries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
