#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB running oracle_sql.json on the same sf tables.
Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
# optional third arg: write a driver-artifact-shaped JSON
# ({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
#   oracle_sec, err}}) alongside the text report
jsonout = sys.argv[3] if len(sys.argv) > 3 else None
report = {}

def record(name, ok, spark_rows=None, oracle_rows=None, err=None,
           schema_ok=None, rows_ok=None, sec=None):
    report[name] = {
        "rows_match": bool(rows_ok) if rows_ok is not None else bool(ok),
        "schema_match": bool(schema_ok) if schema_ok is not None else bool(ok),
        "hash_match": bool(ok),
        "spark_rows": None if spark_rows is None else int(spark_rows),
        "oracle_rows": None if oracle_rows is None else int(oracle_rows),
        "oracle_sec": None if sec is None else round(sec, 2),
        "err": err,
    }

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/*")
               if os.path.isdir(p))
fails = []
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)]) if files \
        else pd.DataFrame()
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(got)} rows")
        if len(got) == 0:
            fails.append(name)
        record(name, len(got) > 0, spark_rows=len(got), err="no_oracle")
        continue
    t0 = time.time()
    try:
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        record(name, False, spark_rows=len(got), err=str(e)[:300])
        continue
    osec = time.time() - t0
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    if list(got.columns) != list(want.columns):
        print(f"{name:28s} SCHEMA MISMATCH: {list(got.columns)} vs {list(want.columns)}")
        fails.append(name)
        record(name, False, spark_rows=len(got), oracle_rows=len(want),
               schema_ok=False, sec=osec)
        continue
    if len(got) != len(want):
        print(f"{name:28s} ROWS MISMATCH: {len(got)} vs {len(want)}")
        fails.append(name)
        record(name, False, spark_rows=len(got), oracle_rows=len(want),
               rows_ok=False, sec=osec)
        continue
    def norm(s):
        # date / datetime-at-midnight → ISO string, so Spark DATE (python
        # date objects) and DuckDB DATE (datetime64) compare equal
        if s.dtype.kind == 'M' or (s.dtype == object and len(s) and
                                   hasattr(s.iloc[0], 'isoformat')):
            return pd.to_datetime(s).dt.strftime('%Y-%m-%dT%H:%M:%S')
        return s
    got = got.apply(norm)
    want = want.apply(norm)
    bad = None
    for c in got.columns:
        g, w = got[c].values, want[c].values
        if g.dtype.kind == 'f' or w.dtype.kind == 'f':
            eq = (pd.isna(g) & pd.isna(w)) | (g == w)
        else:
            # both-null == both-null here too (an all-NULL MAX(ts) column
            # norm()s to NaN, and object-NaN != object-NaN under .eq)
            eq = (pd.Series(g).isna().values & pd.Series(w).isna().values) | \
                pd.Series(g).astype(object).eq(pd.Series(w).astype(object)).values
        if not eq.all():
            i = int(np.argmin(eq))
            bad = (c, i, g[i], w[i])
            break
    if bad:
        c, i, gv, wv = bad
        print(f"{name:28s} VALUE MISMATCH col={c} row={i}: got={gv!r} want={wv!r}")
        fails.append(name)
        record(name, False, spark_rows=len(got), oracle_rows=len(want),
               err=f"col={c} row={i}", sec=osec)
    else:
        print(f"{name:28s} OK ({len(got)} rows)")
        record(name, True, spark_rows=len(got), oracle_rows=len(want),
               sec=osec)
print()
if jsonout:
    with open(jsonout, "w") as fh:
        json.dump(report, fh, indent=2, sort_keys=True)
print(f"{len(names) - len(fails)}/{len(names)} pass" +
      (f"; FAILING: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
