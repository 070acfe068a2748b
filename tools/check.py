#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Dev tooling only (not library)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
# Default replicates the driver's exact hash compare. At rehearsal scale
# (ScaleUp data) float aggregates accumulate in different orders on the
# two engines, so exact equality of a 12-digit sum is noise, not signal —
# pass e.g. --rtol=1e-9 there.
rtol = next((float(a.split("=", 1)[1]) for a in sys.argv if a.startswith("--rtol=")), 0.0)

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # the driver writes single files; Spark (e.g. the ScaleUp output)
    # writes a directory of part files — accept both layouts
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name} (no spark output)"); fail += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_path}/*.parquet"))])
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    problems = []
    warnings = []  # hash-risk flags that should NOT suppress the value diff
    if list(got.columns) != list(exp.columns):
        problems.append(f"schema: spark={list(got.columns)} duck={list(exp.columns)}")
    elif len(got) != len(exp):
        problems.append(f"rows: spark={len(got)} duck={len(exp)}")
    else:
        # The driver hashes typed values — an int column on one side vs a
        # float on the other (e.g. DuckDB sum(int)→HUGEINT→float64) fails
        # its hash even when numerically equal. Flag dtype-kind drift.
        for c in got.columns:
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            if gk != ek and {gk, ek} <= {'i', 'u', 'f'}:
                warnings.append(f"dtype col {c}: spark={got[c].dtype} duck={exp[c].dtype}"
                                " (hash-mismatch risk: cast oracle to BIGINT/DOUBLE)")
        for c in got.columns:
            # first non-null value, not iloc[0]: a leading None/NaN would
            # mask ndarrays/dicts further down the column
            if got[c].dtype == object and len(got):
                nonnull = got[c].dropna()
                if len(nonnull) and isinstance(
                        nonnull.iloc[0], (np.ndarray, list, dict)):
                    problems.append(f"col {c}: complex type (ndarray/dict) — driver sort"
                                    " will crash; serialize with to_json")
    if not problems:
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        for c in got.columns:
            a, b = gs[c], es[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    same = np.allclose(a.astype(float).fillna(np.nan), b.astype(float).fillna(np.nan),
                                       rtol=rtol, atol=0, equal_nan=True)
                else:
                    same = a.astype(str).equals(b.astype(str))
            except Exception as e:
                same = False
            if not same:
                diffs = (gs[c].astype(str) != es[c].astype(str))
                idx = diffs[diffs].index[:3].tolist()
                problems.append(f"col {c}: first diffs at rows {idx}: "
                                f"spark={gs.loc[idx, c].tolist()} duck={es.loc[idx, c].tolist()}")
    if problems or warnings:
        print(f"FAIL     {name}: " + " | ".join(warnings + problems)); fail += 1
    else:
        print(f"OK       {name} ({len(got)} rows)"); ok += 1
# Rows-only outputs (no oracle SQL) still get read + sorted by the driver:
# a column holding ndarrays/dicts crashes its pandas sort (r1: six
# q_hyperion_* queries got spark_rows=null). Vet sortability here too.
for d in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, d)
    if not os.path.isdir(path) or d in oracle:
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))])
        got.sort_values(by=list(got.columns)).reset_index(drop=True)
        print(f"OK-ROWS  {d} ({len(got)} rows, sortable)"); ok += 1
    except Exception as e:
        print(f"FAIL     {d}: rows-only output unsortable/unreadable: {e}"); fail += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
