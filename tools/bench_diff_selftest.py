#!/usr/bin/env python3
"""A/B fixture for the bench_diff classification lanes (round 16).

Synthesizes base/cur BENCH_DETAIL pairs and asserts the gate's verdict
in BOTH directions for the new cpu_anchor lane:
  1. ambient  — a hot session (controls 1.25x) triples a tiny query's
     wall while its control-deflated CPU is flat in absolute terms
     => ambient_suspect (deflated_by=cpu_anchor), exit 0.
  2. planted compute regression — CPU moves with the wall (3x, +3.1 s)
     on the SAME hot session => stays a fatal violation, exit 1.
  3. planted I/O-wait regression — wall +2.0 s with flat CPU exceeds
     --wall-delta-cap => stays a fatal violation (the lane cannot
     excuse real seconds of added wait).
  4. quiet session — the same tiny-query wall move WITHOUT hot
     controls => violation (the lane requires a provably hot session).
  5. isolated re-measure at base speed settles case 2's twin back to
     green (the clearance path every suspect is pointed at).

Run: python3 tools/bench_diff_selftest.py   (prints PASS lines, exit 0)
"""
import json, os, subprocess, sys, tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
BD = os.path.join(HERE, "bench_diff.py")


def detail(queries, cpu, controls, controls_cpu):
    return {"queries": queries, "run_spread": {q: 0.02 for q in queries},
            "cpu_sec": cpu, "controls": controls,
            "controls_cpu": controls_cpu}


CTL_BASE = {"ctl_scan_agg": [0.5, 0.5], "ctl_join": [0.6, 0.6],
            "ctl_window": [0.8, 0.8], "ctl_string": [0.3, 0.3],
            "ctl_multijob": [1.0, 1.0]}
CTL_HOT = {k: [v * 1.25 for v in vs] for k, vs in CTL_BASE.items()}
CTLC_BASE = {k: [0.2, 0.2] for k in CTL_BASE}
CTLC_FLAT = {k: [0.21, 0.21] for k in CTL_BASE}  # cpu_ambient ~1.05


def run(base, cur, extra=()):
    with tempfile.TemporaryDirectory() as d:
        bp, cp = os.path.join(d, "b.json"), os.path.join(d, "c.json")
        json.dump(base, open(bp, "w")); json.dump(cur, open(cp, "w"))
        iso = []
        for i, e in enumerate(extra):
            p = os.path.join(d, f"iso{i}.json")
            json.dump(e, open(p, "w")); iso += [p]
        cmd = [sys.executable, BD, "--base", bp, "--cur", cp]
        if iso:
            cmd += ["--isolated"] + iso
        r = subprocess.run(cmd, capture_output=True, text=True)
        return r.returncode, json.loads(r.stdout)


def check(name, cond):
    if not cond:
        sys.exit(f"FAIL: {name}")
    print(f"PASS: {name}")


# 1. Hot session, tiny launch-dominated query: wall 0.10 -> 0.38 (3.8x)
#    with CPU 0.033 -> 0.068 (raw ratio 2.06 — the real r15 q_explode
#    shape). Must land in ambient_suspect via cpu_anchor, ok=true.
base = detail({"q_tiny": 0.10, "q_big": 5.0}, {"q_tiny": 0.033, "q_big": 4.0},
              CTL_BASE, CTLC_BASE)
cur = detail({"q_tiny": 0.38, "q_big": 5.1}, {"q_tiny": 0.068, "q_big": 4.1},
             CTL_HOT, CTLC_FLAT)
rc, rep = run(base, cur)
check("ambient tiny query -> cpu_anchor suspect, exit 0",
      rc == 0 and rep["ok"]
      and [e["query"] for e in rep["ambient_suspect"]] == ["q_tiny"]
      and rep["ambient_suspect"][0]["deflated_by"] == "cpu_anchor"
      and not rep["violations"])

# 2. Planted compute regression on the SAME hot session: q_big's wall
#    AND cpu triple. Flat-CPU lanes must not fire; fatal.
cur2 = detail({"q_tiny": 0.38, "q_big": 15.0},
              {"q_tiny": 0.068, "q_big": 12.4}, CTL_HOT, CTLC_FLAT)
rc, rep = run(base, cur2)
check("planted compute regression stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_big"])

# 3. Planted I/O-wait regression: wall 1.0 -> 3.0 (+2.0 s > cap), CPU
#    flat. The cpu_anchor lane's wall-delta cap must keep it fatal.
base3 = detail({"q_io": 1.0}, {"q_io": 0.8}, CTL_BASE, CTLC_BASE)
cur3 = detail({"q_io": 3.0}, {"q_io": 0.82}, CTL_HOT, CTLC_FLAT)
rc, rep = run(base3, cur3)
check("planted I/O-wait regression (flat CPU, +2 s) stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_io"])

# 4. Quiet session: identical tiny-query move but controls read 1.0 —
#    no hot-session corroboration, so the lane must NOT fire.
cur4 = detail({"q_tiny": 0.38, "q_big": 5.1},
              {"q_tiny": 0.068, "q_big": 4.1}, CTL_BASE, CTLC_BASE)
rc, rep = run(base, cur4)
check("same move on a quiet session stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_tiny"])

# 5. Isolated re-measure at base speed settles a hot-sweep violation.
iso = {"queries": {"q_big": 5.05}, "run_spread": {"q_big": 0.02},
       "cpu_sec": {"q_big": 4.0}}
rc, rep = run(base, cur2, extra=[iso])
check("isolated re-measure at base speed clears the entry",
      rc == 0 and rep["ok"] and not rep["violations"]
      and "q_big" in rep["isolated_overrides"])

# 6. Launch-cost lane (round 17): a 60-job-start deep query's wall
#    moves 2.0 -> 3.2 with flat CPU while ctl_multijob drifts
#    2.0 -> 2.18 — BELOW the hot threshold (1.09), so neither scalar
#    deflator fires and the +1.2 s delta exceeds the cpu_anchor cap.
#    The per-job price divides by the control's MEASURED job-start
#    count (30/exec — ten actions x ~3 AQE jobs), never an action
#    count: delta 0.18/30 = 0.006 s/job, debt 60 x 0.006 = 0.36 s,
#    adjusted 2.84 / base 2.0 = 1.42 passes; the clamp keeps
#    launch_adjusted at or above base.
CTL_MJ_BASE = dict(CTL_BASE, ctl_multijob=[2.0, 2.0])
CTL_MJ_DRIFT = dict(CTL_BASE, ctl_multijob=[2.18, 2.18])
CTL_JOBS = {"ctl_multijob": [30.0, 30.0]}
base6 = detail({"q_deep": 2.0}, {"q_deep": 1.0}, CTL_MJ_BASE, CTLC_BASE)
cur6 = detail({"q_deep": 3.2}, {"q_deep": 1.02}, CTL_MJ_DRIFT, CTLC_FLAT)
cur6["n_jobs"] = {"q_deep": 60.0}
cur6["controls_jobs"] = CTL_JOBS
rc, rep = run(base6, cur6)
check("multi-job launch drift -> launch_cost suspect, exit 0",
      rc == 0 and rep["ok"]
      and [e["query"] for e in rep["ambient_suspect"]] == ["q_deep"]
      and rep["ambient_suspect"][0]["deflated_by"] == "launch_cost"
      and rep["ambient_suspect"][0]["n_jobs"] == 60.0
      and rep["ambient_suspect"][0]["launch_adjusted"] >= 2.0
      and rep["launch_delta_per_job"] == 0.006
      and rep["ambient_note"] is not None
      and not rep["violations"])

# 7. Same launch drift but the CPU moved with the wall (1.0 -> 1.9):
#    the flat-CPU guard must keep the lane shut — fatal.
cur7 = detail({"q_deep": 3.2}, {"q_deep": 1.9}, CTL_MJ_DRIFT, CTLC_FLAT)
cur7["n_jobs"] = {"q_deep": 60.0}
cur7["controls_jobs"] = CTL_JOBS
rc, rep = run(base6, cur7)
check("launch drift with moved CPU stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_deep"])

# 8. No n_jobs (or no recorded control job count) in the artifacts:
#    the lane cannot price the debt — mechanical or nothing.
cur8 = detail({"q_deep": 3.2}, {"q_deep": 1.02}, CTL_MJ_DRIFT, CTLC_FLAT)
cur8["controls_jobs"] = CTL_JOBS
rc, rep = run(base6, cur8)
check("launch drift without n_jobs stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_deep"])
cur8b = detail({"q_deep": 3.2}, {"q_deep": 1.02}, CTL_MJ_DRIFT, CTLC_FLAT)
cur8b["n_jobs"] = {"q_deep": 60.0}
rc, rep = run(base6, cur8b)
check("launch drift without a measured control job count stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_deep"])

# 9. Job-count regression: the base ran q_deep in 15 jobs, cur runs it
#    in 60 (e.g. accidental extra iterations — launch-heavy, CPU
#    flat). The lane prices debt at MIN(base, cur) jobs, so the 45
#    added jobs earn no credit: debt 15 x 0.006 = 0.09, adjusted
#    3.11 / 2.0 = 1.56 — stays fatal.
base9 = detail({"q_deep": 2.0}, {"q_deep": 1.0}, CTL_MJ_BASE, CTLC_BASE)
base9["n_jobs"] = {"q_deep": 15.0}
rc, rep = run(base9, cur6)
check("job-count regression earns no launch credit, stays fatal",
      rc == 1 and [e["query"] for e in rep["violations"]] == ["q_deep"])

print("bench_diff_selftest: all green")
