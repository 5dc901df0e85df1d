#!/usr/bin/env python3
"""Dev-loop mirror of the driver's correctness gate.

Usage: python3 selfcheck.py [sfdir] [outdir]
Runs DuckDB on oracle_sql.json written by graft.Verify and compares each
query's parquet dump (rows, schema names, value hash) the way the driver
described: columns sorted by name, values hashed.
"""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def cell(v):
    # Floats get a type-marking suffix so an int64 Spark column never
    # hash-matches a float64 oracle column (DuckDB sum() is HUGEINT →
    # pandas float64; a bare str() made 1 and 1.0 collide in round 1).
    # FULL precision (%.17g): the driver hashes full values, and the
    # round-4 verdict showed %.6g masked last-cent diffs in 6-figure
    # averages — the dev gate said green while the driver said red.
    if isinstance(v, float):
        return f"{v:.17g}f"
    return str(v)

def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); bad += 1; continue
    try:
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = norm(con.execute(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); bad += 1; continue
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
    if list(spark_df.columns) != list(duck_df.columns):
        problems.append(f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
    elif df_hash(spark_df) != df_hash(duck_df):
        problems.append("hash mismatch")
        for c in spark_df.columns:
            a, b = spark_df[c].map(cell), duck_df[c].map(cell)
            if len(a) == len(b) and not (a.values == b.values).all():
                i = (a.values != b.values).argmax()
                problems.append(f"  col {c} first diff row {i}: {a.values[i]!r} vs {b.values[i]!r}")
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems)); bad += 1
    else:
        print(f"OK   {name} ({len(spark_df)} rows)"); ok += 1

# rows-only queries (no oracle): check >0 rows
for d in sorted(glob.glob(f"{outdir}/q*")):
    name = d.split("/")[-1]
    if name in oracle: continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"{'OK  ' if n > 0 else 'FAIL'} {name} rows-only ({n} rows)")
    ok += n > 0; bad += n == 0

print(f"\n{ok} ok, {bad} fail")
sys.exit(1 if bad else 0)
