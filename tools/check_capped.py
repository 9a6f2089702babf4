#!/usr/bin/env python3
"""Per-query-capped oracle gate for big SFs, where one DuckDB oracle can
monopolize hours: runs tools/check.py one query at a time under a wall cap,
records timeouts honestly as {"err": "oracle_timeout(<sec>s)"} instead of
hanging the whole gate.

Usage: python3 tools/check_capped.py <sfdir> <outdir> <jsonout> [cap_sec] [names...]
Names default to every query dir in <outdir>, cheapest families first.
"""
import json, os, subprocess, sys, glob, shutil, time

sfdir, outdir, jsonout = sys.argv[1:4]
cap = int(sys.argv[4]) if len(sys.argv) > 4 else 1800
names = sys.argv[5:] or sorted(
    os.path.basename(p) for p in glob.glob(f"{outdir}/*") if os.path.isdir(p))

merged = {}
if os.path.exists(jsonout):           # resumable: keep prior rows
    merged = json.load(open(jsonout))

for name in names:
    if name in merged:
        print(f"{name:28s} (cached: "
              f"{'OK' if merged[name].get('hash_match') else merged[name].get('err')})")
        continue
    single = f"/tmp/check_one_{name}"
    shutil.rmtree(single, ignore_errors=True)
    os.makedirs(single)
    os.symlink(os.path.abspath(f"{outdir}/{name}"), f"{single}/{name}")
    os.symlink(os.path.abspath(f"{outdir}/oracle_sql.json"),
               f"{single}/oracle_sql.json")
    t0 = time.time()
    r = subprocess.run(
        ["timeout", str(cap), sys.executable, "tools/check.py",
         sfdir, single, f"{single}/report.json"],
        capture_output=True, text=True)
    sec = time.time() - t0
    if r.returncode == 124:           # timeout(1)'s exit code
        merged[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": None,
                        "oracle_rows": None, "oracle_sec": round(sec, 1),
                        "err": f"oracle_timeout({cap}s)"}
        print(f"{name:28s} ORACLE TIMEOUT after {cap}s")
    else:
        # check.py can die for non-timeout reasons (crash, OOM-kill rc=137,
        # no report.json written) — record honestly and keep going instead
        # of aborting the whole gate loop (ADVICE r9).
        try:
            rep = json.load(open(f"{single}/report.json"))
        except (FileNotFoundError, json.JSONDecodeError):
            merged[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "oracle_sec": round(sec, 1),
                            "err": f"check_failed(rc={r.returncode})"}
            print(f"{name:28s} CHECK FAILED rc={r.returncode}")
            rep = None
        if rep is not None:
            merged.update(rep)
            line = [l for l in r.stdout.splitlines() if l.startswith(name)]
            print(line[0] if line else f"{name}: rc={r.returncode}")
    shutil.rmtree(single, ignore_errors=True)
    with open(jsonout, "w") as fh:
        json.dump(merged, fh, indent=2, sort_keys=True)

ok = sum(1 for v in merged.values() if v.get("hash_match"))
to = sum(1 for v in merged.values()
         if str(v.get("err", "")).startswith("oracle_timeout"))
print(f"\n{ok} bit-exact, {to} oracle-timeout, "
      f"{len(merged) - ok - to} other, of {len(merged)}")
