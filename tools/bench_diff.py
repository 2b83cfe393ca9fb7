#!/usr/bin/env python3
"""Round-over-round bench regression gate.

Compares the current BENCH_DETAIL.json per-query medians against a
baseline detail file (default: the version committed at a given git
ref) and fails loudly when any query regressed past the tolerance.

A "violation" needs BOTH:
  - ratio  cur/base > tolerance (default 1.5x), and
  - an absolute delta > floor seconds (default 0.25 s) — sub-floor
    entries jitter by tens of ms of job-launch noise, which reads as a
    huge RELATIVE ratio while meaning nothing.
Entries whose recorded run spread (either round) already exceeds the
tolerance band are reported as "noisy" rather than violations: a delta
inside the measurement's own noise is not evidence of regression.

Ambient normalization (round 12): a whole SWEEP can run hot — the
round-11 driver sweep measured 132.2 s where two same-tree builder
sweeps measured 116.7/117.2 s, and its 6 "violations" were all queries
nobody had touched. The sweep-wide slowdown estimator is the MEDIAN of
per-query ratios cur/base over the common entries with a non-trivial
base (>= 0.05 s): a co-tenant/ambient shift moves the median, a few
genuine regressions cannot. When that `ambient_ratio` exceeds
--ambient-threshold (default 1.10), each would-be violation is
re-tested with its current median DEFLATED by the ambient ratio; an
entry that passes the deflated test moves to `ambient_suspect` —
reported, not fatal, with the instruction to re-measure it isolated.
An entry that fails even after deflation is a genuine violation.

Control-based ambient (round 13): graft.Bench interleaves FROZEN
control queries (pure Spark built-ins, never part of SparkEntry) at
fixed points through every sweep and records their per-point samples
in BENCH_DETAIL under `controls`. When BOTH artifacts carry controls,
the ambient ratio is the median over controls of
median(cur samples)/median(base samples) — by construction the
controls' code is identical across rounds, so their ratio measures
the MACHINE and cannot be moved by genuine operator regressions the
way the all-queries median could (ambient_source: "controls" vs
"query_median"). Per-control ratios are reported for audit.

CPU second opinion (round 13, tightened round 14): BENCH_DETAIL also
carries `cpu_sec` — the median executor-CPU seconds per execution,
bracketed by a deterministic listener drain. Co-tenant load inflates
wall-clock but barely touches task CPU, so a flat CPU ratio FLAGS a
would-be wall violation (`cpu_flat: true`). Flat CPU alone does NOT
downgrade it: a pure I/O-wait regression (extra checkpoint write,
shuffle spill, added sleep) burns little CPU too. The entry moves to
`ambient_suspect` only with a second corroborating signal — the
session measured hot AND the ambient-deflated wall passing — and
otherwise stays a fatal violation until an isolated re-measure of the
same build clears it.

CPU ambient deflator (round 16): the CPU second opinion itself needs
normalizing — the round-15 driver sweep measured q_explode's cpu_ratio
at 2.06 ON IDENTICAL CODE, converting machine ambient into formal
violations no lane could clear. Two fixes: (a) per-query cpu_ratio is
DEFLATED by `cpu_ambient` — the median over frozen controls of
median(cur controls_cpu)/median(base controls_cpu) (code-identical, so
their CPU ratio is pure measurement-context drift); (b) the flatness
test gets the same absolute floor the wall test has — a 0.03 s-CPU
query whose cpu reads 0.07 s hot has a 2.3x "ratio" that means
nothing, so CPU is `cpu_anchored_flat` when the deflated ratio passes
tolerance OR the deflated absolute delta is under --cpu-floor. A new
suspect lane then applies to launch-dominated tiny queries that scalar
wall deflation cannot clear (ten sub-100 ms jobs each +30 ms of launch
debt = a 3x wall ratio no single deflator reproduces): session hot on
controls (ambient or launch axis) + cpu_anchored_flat + wall delta
under --wall-delta-cap (default 1.0 s, so a multi-second I/O-wait
regression can never ride it) => ambient_suspect tagged
deflated_by=cpu_anchor — reported, not fatal, settled by the same
isolated re-measure protocol. A planted compute regression moves CPU
in both ratio and absolute terms and stays a fatal violation
(tools/bench_diff_selftest.py pins both directions).

Launch-cost model (round 17): BENCH_DETAIL carries per-query median
job counts (`n_jobs`). The ctl_multijob control prices the session's
per-job fixed-latency drift as (med(cur)-med(base))/10 on its
code-identical ten-action batches; a would-be violation whose
(control-deflated) CPU is flat re-tests at cur - n_jobs*delta. This
replaces the narrative "it launches ~15 jobs and the machine's launch
cost drifted" with the same statement computed from in-artifact
numbers; entries that pass move to ambient_suspect tagged
deflated_by=launch_cost and settle by the usual isolated protocol.

Isolated re-measures: --isolated FILE(s) take BENCH_DETAIL(_PARTIAL)
files from `SPARK_GRAFT_ONLY=...` runs of the SAME build; their
medians override --cur for the queries they contain (marked
`isolated: true` in the report). An isolated single-query run carries
no sweep-context debt, so it settles ambient-suspect entries
mechanically: the final verdict for an overridden query uses the
isolated median against the plain (undeflated) tolerance.

Usage:
  tools/bench_diff.py [--base-ref HEAD~1 | --base FILE] [--cur FILE]
                      [--isolated FILE ...]
                      [--tolerance 1.5] [--floor 0.25] [--out FILE]
Exit 1 when violations is non-empty.
"""
import argparse, json, subprocess, sys


def load_from_ref(ref, path="BENCH_DETAIL.json"):
    out = subprocess.run(["git", "show", f"{ref}:{path}"],
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"cannot read {path} at {ref}: {out.stderr.strip()}")
    return json.loads(out.stdout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", help="baseline BENCH_DETAIL.json file")
    ap.add_argument("--base-ref", default="HEAD",
                    help="git ref holding the baseline BENCH_DETAIL.json")
    ap.add_argument("--cur", default="BENCH_DETAIL.json")
    ap.add_argument("--cur-min-of", nargs="+", default=None,
                    help="instead of --cur, combine several same-code "
                         "sweeps by per-query MIN of medians: co-tenant "
                         "load noise is strictly additive, so the min "
                         "across sweeps is the robust capability "
                         "estimate for regression detection")
    ap.add_argument("--isolated", nargs="+", default=None,
                    help="BENCH_DETAIL(_PARTIAL).json files from "
                         "SPARK_GRAFT_ONLY isolated re-measures of the "
                         "same build; their medians override --cur for "
                         "the queries they contain")
    ap.add_argument("--tolerance", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.25)
    ap.add_argument("--cpu-floor", type=float, default=0.25,
                    help="absolute deflated-CPU delta (sec) under which "
                         "CPU counts as flat regardless of ratio — tiny "
                         "CPU bases make ratios meaningless")
    ap.add_argument("--wall-delta-cap", type=float, default=1.0,
                    help="max absolute wall delta (sec) the cpu_anchor "
                         "suspect lane may cover; bigger moves stay "
                         "fatal even with flat CPU")
    ap.add_argument("--ambient-threshold", type=float, default=1.10,
                    help="median cur/base ratio above which the sweep "
                         "is classified ambient-hot and would-be "
                         "violations are re-tested deflated")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    base = (json.load(open(args.base)) if args.base
            else load_from_ref(args.base_ref))
    if args.cur_min_of:
        sweeps = [json.load(open(f)) for f in args.cur_min_of]
        qs = set().union(*(s["queries"] for s in sweeps))
        cur = {"queries": {}, "run_spread": {}}
        for q in qs:
            have = [s for s in sweeps if q in s["queries"]]
            best = min(have, key=lambda s: s["queries"][q])
            cur["queries"][q] = best["queries"][q]
            sp = best.get("run_spread", {}).get(q)
            if sp is not None:
                cur["run_spread"][q] = sp
            # carry the chosen sweep's paired per-query metadata so
            # the CPU and launch-cost lanes keep working in min-of
            # mode (wall/cpu/jobs stay from ONE measurement context)
            for fld in ("cpu_sec", "n_jobs"):
                v = best.get(fld, {}).get(q)
                if v is not None:
                    cur.setdefault(fld, {})[q] = v
        # controls are samples of the same frozen plans: concatenate
        # across sweeps (more ambient evidence, not less)
        for fld in ("controls", "controls_cpu", "controls_jobs"):
            merged = {}
            for s in sweeps:
                for k, ss in (s.get(fld) or {}).items():
                    merged.setdefault(k, []).extend(ss)
            if merged:
                cur[fld] = merged
        args.cur = "min(" + ", ".join(args.cur_min_of) + ")"
    else:
        cur = json.load(open(args.cur))
    bq, cq = base["queries"], cur["queries"]
    bs, cs = base.get("run_spread", {}), cur.get("run_spread", {})
    bcpu, ccpu = base.get("cpu_sec", {}), cur.get("cpu_sec", {})

    isolated = {}
    iso_ambients = {}
    for f in (args.isolated or []):
        iso = json.load(open(f))
        # An isolated session's own control samples vs the BASE's
        # controls give that session's ambient — recorded per file for
        # audit (the override verdict still uses the raw min: a hot
        # isolated session is already handled by min-of-same-build).
        ic, ibc = iso.get("controls") or {}, base.get("controls") or {}
        pairs = [(k, ic[k], ibc[k]) for k in ic
                 if k in ibc and ic[k] and ibc[k]]
        if pairs:
            def _med(xs):
                s = sorted(xs)
                return s[(len(s) - 1) // 2]
            rs = sorted(_med(c) / _med(b) for _, c, b in pairs if _med(b) > 0)
            if rs:
                iso_ambients[f] = round(rs[(len(rs) - 1) // 2], 3)
        for q, v in iso["queries"].items():
            # Several isolated files may re-measure the same query;
            # keep the min (additive-noise argument, as --cur-min-of).
            if q not in isolated or v < isolated[q][0]:
                isolated[q] = (v, iso.get("run_spread", {}).get(q), f)

    common = sorted(set(bq) & set(cq))

    def med(xs):
        s = sorted(xs)
        return s[(len(s) - 1) // 2]

    # Preferred ambient estimator: the frozen interleaved controls,
    # when both artifacts carry them (code-identical across rounds, so
    # their ratio is pure machine/context drift). Fallback: median
    # per-query ratio over entries whose base is big enough that the
    # ratio means something.
    control_ratios = None
    bc, cc = base.get("controls") or {}, cur.get("controls") or {}
    ctl_common = [k for k in sorted(bc)
                  if k in cc and bc[k] and cc[k] and med(bc[k]) > 0]
    if ctl_common:
        control_ratios = {k: round(med(cc[k]) / med(bc[k]), 3)
                          for k in ctl_common}
        ambient = med(list(control_ratios.values()))
        ambient_source = "controls"
    else:
        ratios = [cq[q] / bq[q] for q in common if bq[q] >= 0.05]
        # Same lower-median convention as med() so the ambient verdict
        # cannot flip between estimator paths on even-sized samples.
        ambient = med(ratios) if ratios else 1.0
        ambient_source = "query_median"
    ambient_hot = ambient > args.ambient_threshold

    # Per-job fixed latency drifts INDEPENDENTLY of the single-action
    # controls: round 14 measured multi-job queries at 1.5-2x on a
    # machine where scan/join/window/string controls read 1.007.
    # ctl_multijob (ten tiny actions per exec, round 15) prices exactly
    # that axis. When it reads hot while the overall ambient does not,
    # would-be violations get a SECOND deflation test against its
    # ratio; entries that pass move to ambient_suspect tagged
    # deflated_by=ctl_multijob — reported, not fatal, and settled by
    # the same isolated re-measure protocol as ambient deflation.
    # The lane additionally REQUIRES the CPU second opinion flat
    # (cpu_ratio <= tolerance on a non-trivial base): job-launch drift
    # inflates wall-clock while barely touching executor CPU, so a
    # genuine compute regression on a single-job query (CPU moved with
    # the wall) can never ride this lane — without that guard a hot
    # launch control alone could excuse any violation while the four
    # compute controls read cold.
    launch = (control_ratios or {}).get("ctl_multijob")
    launch_hot = launch is not None and launch > args.ambient_threshold

    # Mechanical launch-cost model (round 17): BENCH_DETAIL carries
    # per-query median job counts (`n_jobs`; the cur side alone is
    # enough — a query's job count is code-determined and stable).
    # ctl_multijob executes ten tiny actions per measurement, so
    # (med(cur) − med(base)) / 10 over its code-identical samples
    # prices the session's PER-JOB fixed-latency drift. A would-be
    # violation re-tests at launch_adjusted = cur − n_jobs·δ — the
    # measured machine debt subtracted mechanically instead of argued
    # query by query (the pagerank-family pathology: ~15 jobs × a
    # +100 ms/job drift = +1.5 s of wall on untouched code that no
    # scalar ratio deflator reproduces). Same flat-CPU guard as the
    # other launch lanes: compute that moved stays fatal. δ clamps at
    # 0 — a FASTER launch never excuses anything.
    njobs_cur = cur.get("n_jobs") or {}
    njobs_base = base.get("n_jobs") or {}
    # Job count is code-determined, so when BOTH rounds carry it the
    # MIN prices the debt: a code change that ADDS jobs earns no
    # launch credit for jobs the base never launched (the lane must
    # not subsidize job-count regressions).
    njobs = {q: (min(njobs_base[q], v) if njobs_base.get(q) else v)
             for q, v in njobs_cur.items()}
    # The per-job denominator is the control's own MEASURED job-start
    # count (`controls_jobs`) — NOT its action count: AQE materializes
    # shuffle stages as separate jobs, so ctl_multijob's ten actions
    # fire ~30 job-starts per exec on this engine, and query n_jobs is
    # counted in the same raw job-start units. No recorded count, no
    # lane (mechanical or nothing).
    launch_delta_per_job = None
    ctl_jobs = ((cur.get("controls_jobs") or {}).get("ctl_multijob")
                or (base.get("controls_jobs") or {}).get("ctl_multijob"))
    if ((bc or {}).get("ctl_multijob") and (cc or {}).get("ctl_multijob")
            and ctl_jobs and med(ctl_jobs) > 0):
        launch_delta_per_job = max(
            0.0, (med(cc["ctl_multijob"]) - med(bc["ctl_multijob"]))
            / med(ctl_jobs))

    # CPU ambient (round 16): the frozen controls' executor-CPU medians
    # across rounds measure how much the MEASUREMENT of CPU drifted on
    # identical code (GC pressure, JIT state, co-tenant cache pollution
    # all inflate task CPU a little). Per-query cpu_ratio is deflated by
    # this before any flatness test.
    control_cpu_ratios = None
    bccpu, cccpu = base.get("controls_cpu") or {}, cur.get("controls_cpu") or {}
    cpu_ctl_common = [k for k in sorted(bccpu)
                      if k in cccpu and bccpu[k] and cccpu[k]
                      and med(bccpu[k]) > 0]
    if cpu_ctl_common:
        control_cpu_ratios = {k: round(med(cccpu[k]) / med(bccpu[k]), 3)
                              for k in cpu_ctl_common}
        cpu_ambient = med(list(control_cpu_ratios.values()))
    else:
        cpu_ambient = 1.0
    session_hot = ambient_hot or launch_hot

    violations, noisy, improved, suspects = [], [], [], []
    for q in common:
        b, c = bq[q], cq[q]
        entry = {"query": q, "base": b, "cur": c,
                 "ratio": round(c / b, 3) if b > 0 else None,
                 "spread_base": bs.get(q), "spread_cur": cs.get(q)}
        cpu_ratio = None
        cpu_anchored_flat = False
        if bcpu.get(q) and ccpu.get(q) and bcpu[q] > 0:
            cpu_ratio = round(ccpu[q] / bcpu[q], 3)
            entry["cpu_ratio"] = cpu_ratio
            # Deflated by the controls' own CPU drift; flat when the
            # deflated ratio passes tolerance OR the deflated absolute
            # delta is under the CPU floor (tiny bases => ratios are
            # noise: 0.033 s -> 0.068 s is "2.06x" and means nothing).
            cpu_adj = ccpu[q] / cpu_ambient
            entry["cpu_ratio_adj"] = round(cpu_adj / bcpu[q], 3)
            cpu_anchored_flat = (cpu_adj / bcpu[q] <= args.tolerance
                                 or cpu_adj - bcpu[q] <= args.cpu_floor)
        if q in isolated:
            # Same-build measurements all estimate one capability and
            # co-tenant noise is additive, so the MIN of sweep and
            # isolated medians is the robust estimate (an isolated run
            # on a hot machine must not mask a clean in-sweep number).
            iv, isp, ifile = isolated[q]
            best = min(c, iv)
            entry.update({"isolated": True, "cur": best,
                          "cur_in_sweep": c, "cur_isolated": iv,
                          "ratio": round(best / b, 3) if b > 0 else None,
                          "spread_cur": isp, "isolated_from": ifile})
            c = best
        if b > 0 and c / b > args.tolerance and c - b > args.floor:
            spread = max(bs.get(q, 0.0) or 0.0, (entry["spread_cur"] or 0.0))
            if spread > args.tolerance - 1.0:
                noisy.append(entry)
            else:
                if (cpu_ratio is not None and cpu_ratio <= args.tolerance
                        and bcpu.get(q, 0) >= 0.05
                        and not entry.get("isolated")):
                    # The wall moved but the compute did not — flagged,
                    # but flat CPU ALONE is not exculpatory: a pure
                    # I/O-wait regression (an extra checkpoint write, a
                    # shuffle spill, an added sleep) also leaves CPU
                    # flat. It downgrades only with a SECOND
                    # corroborating signal below (hot session + the
                    # deflated wall passing); otherwise it stays a
                    # violation until an isolated re-measure clears it
                    # (the `isolated` branch above is that clearance).
                    entry["cpu_flat"] = True
                if (ambient_hot and not entry.get("isolated")
                        and (c / ambient) / b <= args.tolerance):
                    entry["deflated_ratio"] = round((c / ambient) / b, 3)
                    suspects.append(entry)
                elif (launch_hot and not entry.get("isolated")
                        and cpu_ratio is not None
                        and cpu_ratio <= args.tolerance
                        and bcpu.get(q, 0) >= 0.05
                        and (c / launch) / b <= args.tolerance):
                    entry["deflated_ratio"] = round((c / launch) / b, 3)
                    entry["deflated_by"] = "ctl_multijob"
                    suspects.append(entry)
                elif (launch_delta_per_job and njobs.get(q)
                        and not entry.get("isolated")
                        and cpu_ratio is not None and cpu_anchored_flat
                        # credit clamps at the entry's own wall delta:
                        # launch_adjusted can never read below base (a
                        # physically impossible over-credit would also
                        # let any flat-CPU regression ride the lane)
                        and (c - min(njobs[q] * launch_delta_per_job,
                                     c - b)) / b <= args.tolerance):
                    # The per-job launch-drift subtraction: the debt
                    # removed is machine-priced (control delta per
                    # measured job-start) × code-priced (job count),
                    # never query-narrated.
                    debt = min(njobs[q] * launch_delta_per_job, c - b)
                    entry["deflated_by"] = "launch_cost"
                    entry["n_jobs"] = njobs[q]
                    if (njobs_base.get(q) and njobs_cur.get(q)
                            and njobs_base[q] != njobs_cur[q]):
                        entry["n_jobs_base"] = njobs_base[q]
                        entry["n_jobs_cur"] = njobs_cur[q]
                    entry["launch_delta_per_job"] = round(
                        launch_delta_per_job, 4)
                    entry["launch_adjusted"] = round(c - debt, 3)
                    entry["deflated_ratio"] = round((c - debt) / b, 3)
                    suspects.append(entry)
                elif (session_hot and not entry.get("isolated")
                        and cpu_ratio is not None and cpu_anchored_flat
                        and c - b <= args.wall_delta_cap):
                    # Launch-dominated tiny queries: a hot session's
                    # per-job debt can triple a 0.1 s wall while the
                    # (control-deflated) compute stays put in absolute
                    # terms. No scalar wall deflator reproduces that,
                    # so the corroboration here is compute-side: the
                    # session is provably hot on code-identical
                    # controls AND the deflated CPU did not move. Wall
                    # moves past --wall-delta-cap stay fatal (an added
                    # checkpoint write or sleep that costs real seconds
                    # cannot ride this lane), and like every suspect
                    # lane the verdict is provisional: an isolated
                    # re-measure (which bypasses all lanes) settles it.
                    entry["deflated_by"] = "cpu_anchor"
                    suspects.append(entry)
                else:
                    violations.append(entry)
        elif c > 0 and b / c > args.tolerance and b - c > args.floor:
            improved.append(entry)

    report = {
        "base": args.base or f"{args.base_ref}:BENCH_DETAIL.json",
        "cur": args.cur,
        "isolated_overrides": sorted(isolated),
        "isolated_control_ambient": iso_ambients or None,
        "tolerance": args.tolerance,
        "floor_sec": args.floor,
        "n_common": len(common),
        "ambient_ratio": round(ambient, 3),
        "ambient_source": ambient_source,
        "control_ratios": control_ratios,
        "ambient_hot": ambient_hot,
        "launch_ratio": launch,
        "launch_hot": launch_hot,
        "launch_delta_per_job": (round(launch_delta_per_job, 4)
                                 if launch_delta_per_job is not None
                                 else None),
        "n_jobs_available": bool(njobs),
        "cpu_ambient_ratio": round(cpu_ambient, 3),
        "control_cpu_ratios": control_cpu_ratios,
        "ambient_note": (
            "median per-query cur/base ratio > threshold: the whole "
            "sweep ran hot; entries in ambient_suspect pass at the "
            "deflated ratio and need an isolated re-measure "
            "(SPARK_GRAFT_ONLY=<q> runMain graft.Bench), passed back "
            "via --isolated, to be settled" if ambient_hot else (
            "ctl_multijob > threshold while overall ambient is not: "
            "per-job launch latency drifted; flat-CPU entries in "
            "ambient_suspect (deflated_by=ctl_multijob) pass at the "
            "launch-deflated ratio and need the same isolated "
            "re-measure protocol to be settled" if launch_hot else (
            "below-threshold ctl_multijob drift, priced per measured "
            "job-start: entries in ambient_suspect "
            "(deflated_by=launch_cost) pass with n_jobs x delta "
            "subtracted and need the same isolated re-measure "
            "protocol to be settled"
            if any(e.get("deflated_by") == "launch_cost"
                   for e in suspects) else None))),
        "added": sorted(set(cq) - set(bq)),
        "removed": sorted(set(bq) - set(cq)),
        "sum_base": round(sum(bq[q] for q in common), 3),
        "sum_cur": round(sum(cq[q] for q in common), 3),
        "violations": sorted(violations, key=lambda e: -e["ratio"]),
        "ambient_suspect": sorted(suspects, key=lambda e: -e["ratio"]),
        "noisy_regressions": sorted(noisy, key=lambda e: -e["ratio"]),
        "improvements": sorted(improved, key=lambda e: e["ratio"]),
        "ok": not violations,
    }
    text = json.dumps(report, indent=1)
    if args.out:
        open(args.out, "w").write(text + "\n")
    print(text)
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
