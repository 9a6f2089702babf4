#!/usr/bin/env python3
"""Contamination-gated official bench capture (round-11 VERDICT #2a).

Runs `sbt runMain graft.Bench` at the given SF dir and ACCEPTS the capture
only when the run self-reports clean:
  - `contaminated` is empty (no query's median/min spread exceeded 1.5x
    even after Bench's own bounded re-trials), and
  - the parallel CPU reference stays within DRIFT_MAX of the single-thread
    reference at both ends of the run (cpu_ref_par / cpu_ref ~ 1 on an
    uncontended box; host-neighbor membw contention shows here first).

A dirty capture is re-run (up to --attempts). If no attempt is clean the
LAST capture is still written — self-flagged, never silently dropped —
and the exit code says so.

Usage: python3 tools/bench_capture.py <sfdir> <out.json> [attempts]
"""
import json, os, shutil, subprocess, sys

DRIFT_MAX = 1.10

sfdir = sys.argv[1]
out = sys.argv[2]
attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(i):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir)
    log = f"/tmp/bench_capture_{os.path.basename(out)}.{i}.log"
    with open(log, "w") as fh:
        rc = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                            cwd=repo, env=env, stdout=fh,
                            stderr=subprocess.STDOUT).returncode
    try:
        line = json.loads(open(os.path.join(repo, "bench_last.json")).read())
    except Exception as e:
        return rc, None, f"bench_last.json unreadable: {e}", log
    contaminated = line.get("contaminated", [])
    drifts = []
    for end in ("start", "end"):
        ref = line.get(f"cpu_ref_{end}")
        par = line.get(f"cpu_ref_par_{end}")
        if ref and par:
            drifts.append(par / ref)
    dirty = []
    if contaminated:
        dirty.append(f"contaminated={contaminated}")
    if drifts and max(drifts) > DRIFT_MAX:
        dirty.append(f"cpu_ref_par drift {max(drifts):.2f} > {DRIFT_MAX}")
    if rc != 0:
        dirty.append(f"bench rc={rc}")
    return rc, line, "; ".join(dirty), log


last_line = None
for i in range(attempts):
    rc, line, dirty, log = run_once(i)
    last_line = line
    if line is None:
        print(f"[capture] attempt {i + 1}: {dirty} (log: {log})")
        continue
    print(f"[capture] attempt {i + 1}: total={line.get('value', -1):.1f}s "
          f"errors={len(line.get('errors', []))} "
          f"{'CLEAN' if not dirty else 'DIRTY: ' + dirty}")
    if not dirty:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        shutil.copy(os.path.join(repo, "bench_last.json"), out)
        print(f"[capture] accepted attempt {i + 1} -> {out}")
        sys.exit(0)

if last_line is not None:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    shutil.copy(os.path.join(repo, "bench_last.json"), out)
    print(f"[capture] NO clean attempt in {attempts}; wrote the last "
          f"(self-flagged) capture -> {out}")
sys.exit(1)
