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

Round-14 addition (VERDICT r13 #2): ADMISSION gating on host load. The r13
official capture started at loadavg 4.44 and shipped a +12% median slip
against unchanged plans — per-query retrials heal spiky noise, not a
uniformly busy host. Before EACH attempt the tool now refuses to start
until 1-minute loadavg drops below LOAD_MAX (env GRAFT_BENCH_LOAD_MAX,
default 2.0), polling every ADMIT_POLL_SEC for up to ADMIT_WAIT_SEC; if
the host never quiets down the attempt proceeds anyway (never silently
dropped) and the artifact records admitted_under_load. The accepted
artifact carries the gate parameters and the loadavg observed at
admission under an "admission" key.

Usage: python3 tools/bench_capture.py <sfdir> <out.json> [attempts]
"""
import json, os, shutil, subprocess, sys, time

# Parallel-vs-single CPU reference drift bound. NOT 1.0-ish: on this
# 32-thread guest the all-core reference runs ~1.2x the single-thread
# time even at loadavg<1 with nothing else running (measured 1.17-1.29
# across rounds 13-14 idle captures — SMT/turbo means per-thread speed
# under full fan-out is inherently lower). 1.10 was below that floor, so
# every capture self-flagged regardless of host state; 1.35 sits above
# the measured idle ceiling while still catching the co-tenant membw
# contention episodes the gate exists for (observed >1.5 when busy).
# Override with GRAFT_BENCH_DRIFT_MAX.
DRIFT_MAX = float(os.environ.get("GRAFT_BENCH_DRIFT_MAX", "1.35"))
LOAD_MAX = float(os.environ.get("GRAFT_BENCH_LOAD_MAX", "2.0"))
ADMIT_POLL_SEC = int(os.environ.get("GRAFT_BENCH_ADMIT_POLL_SEC", "30"))
ADMIT_WAIT_SEC = int(os.environ.get("GRAFT_BENCH_ADMIT_WAIT_SEC", "900"))

sfdir = sys.argv[1]
out = sys.argv[2]
attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 3
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg1():
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except Exception:
        return -1.0


def admit(i):
    """Block until the host is quiet enough to measure on; returns the
    admission record for the artifact."""
    waited = 0
    load = loadavg1()
    while load > LOAD_MAX and waited < ADMIT_WAIT_SEC:
        print(f"[capture] attempt {i + 1}: loadavg {load:.2f} > {LOAD_MAX}"
              f" — waiting {ADMIT_POLL_SEC}s ({waited}/{ADMIT_WAIT_SEC})",
              flush=True)
        time.sleep(ADMIT_POLL_SEC)
        waited += ADMIT_POLL_SEC
        load = loadavg1()
    return {"load_max": LOAD_MAX, "loadavg_at_admit": load,
            "waited_sec": waited,
            "admitted_under_load": load > LOAD_MAX}


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


def write_out(line, admission):
    """Write the capture with the admission record stitched in (keeps the
    artifact self-describing about HOW it was admitted, not just how it
    behaved)."""
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    line = dict(line)
    line["admission"] = admission
    with open(out, "w") as fh:
        fh.write(json.dumps(line) + "\n")


last_line, last_admission = None, None
for i in range(attempts):
    admission = admit(i)
    rc, line, dirty, log = run_once(i)
    last_line, last_admission = line, admission
    if line is None:
        print(f"[capture] attempt {i + 1}: {dirty} (log: {log})")
        continue
    if admission["admitted_under_load"]:
        dirty = (dirty + "; " if dirty else "") + \
            f"admitted under load {admission['loadavg_at_admit']:.2f}"
    print(f"[capture] attempt {i + 1}: total={line.get('value', -1):.1f}s "
          f"errors={len(line.get('errors', []))} "
          f"{'CLEAN' if not dirty else 'DIRTY: ' + dirty}")
    if not dirty:
        write_out(line, admission)
        print(f"[capture] accepted attempt {i + 1} -> {out}")
        sys.exit(0)

if last_line is not None:
    write_out(last_line, last_admission)
    print(f"[capture] NO clean attempt in {attempts}; wrote the last "
          f"(self-flagged) capture -> {out}")
sys.exit(1)
