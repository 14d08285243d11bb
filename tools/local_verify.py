#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfdir] [--only q1,q2]

1. Runs `graft.Verify <sfdir> /tmp/graft_verify` via sbt (unless --skip-run).
2. Registers each testdata parquet as a DuckDB view named after the table.
3. Runs every oracle_sql.json entry in DuckDB.
4. Compares to the Spark parquet dump: columns sorted by name, rows sorted
   by all columns, exact value match (floats: exact, since the driver
   hash-compares).

This is builder-side tooling only — the real gate is the driver's.
"""
import json, os, subprocess, sys, glob

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify"
ONLY = None
for a in sys.argv:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
SKIP_RUN = "--skip-run" in sys.argv

if not SKIP_RUN:
    env = dict(os.environ)
    if ONLY:
        env["SPARK_GRAFT_ONLY"] = ",".join(sorted(ONLY))
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800, env=env)
    if "[success]" not in r.stdout:
        print(r.stdout[-4000:]); print(r.stderr[-2000:])
        sys.exit("Verify run failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = []
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    spark_dir = f"{OUT}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"MISSING {name}: no spark output"); fail.append(name); continue
    try:
        got = pd.read_parquet(spark_dir)
        want = con.execute(sql).df()
    except Exception as e:
        print(f"ERROR  {name}: {e}"); fail.append(name); continue
    # driver semantics: sort columns by name, then hash values
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA {name}: spark={list(got.columns)} duck={list(want.columns)}")
        fail.append(name); continue
    if len(got) != len(want):
        print(f"ROWS   {name}: spark={len(got)} duck={len(want)}")
        fail.append(name); continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    ws = want.sort_values(by=list(want.columns), ignore_index=True)
    # normalize types that stringify identically (e.g. int32 vs int64,
    # timestamp precision) the way a value-hash would
    mismatch = None
    for c in gs.columns:
        a, b = gs[c], ws[c]
        # the driver's hash is representation-sensitive: an int64 Spark
        # column vs a float64 oracle column (e.g. DuckDB HUGEINT sum →
        # pandas float) renders "1" vs "1.0" and hash-mismatches even
        # though the values are equal. Flag dtype-kind drift hard here —
        # this is exactly what sank `sessionize` in round 1.
        ka, kb = a.dtype.kind, b.dtype.kind
        if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
            mismatch = (c, f"dtype {a.dtype}", f"dtype {b.dtype}", "kind")
            break
        try:
            av = a.astype(str).str.replace(r"\.0$", "", regex=True)
            bv = b.astype(str).str.replace(r"\.0$", "", regex=True)
            if not av.equals(bv):
                idx = (av != bv).idxmax()
                mismatch = (c, a.iloc[idx], b.iloc[idx], idx)
                break
        except Exception as e:
            mismatch = (c, "?", "?", str(e)); break
    if mismatch:
        c, a, b, i = mismatch
        print(f"VALUE  {name}: col={c} row={i} spark={a!r} duck={b!r}")
        fail.append(name); continue
    print(f"OK     {name} ({len(got)} rows)")

print()
if fail:
    print(f"FAILED: {len(fail)}: {', '.join(fail)}")
    sys.exit(1)
print(f"all {len([n for n in oracle if not ONLY or n in ONLY])} oracle queries match")
