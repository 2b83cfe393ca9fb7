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

Usage:
  tools/bench_diff.py [--base-ref HEAD~1 | --base FILE] [--cur FILE]
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
    ap.add_argument("--tolerance", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.25)
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
        args.cur = "min(" + ", ".join(args.cur_min_of) + ")"
    else:
        cur = json.load(open(args.cur))
    bq, cq = base["queries"], cur["queries"]
    bs, cs = base.get("run_spread", {}), cur.get("run_spread", {})

    common = sorted(set(bq) & set(cq))
    violations, noisy, improved = [], [], []
    for q in common:
        b, c = bq[q], cq[q]
        entry = {"query": q, "base": b, "cur": c,
                 "ratio": round(c / b, 3) if b > 0 else None,
                 "spread_base": bs.get(q), "spread_cur": cs.get(q)}
        if b > 0 and c / b > args.tolerance and c - b > args.floor:
            spread = max(bs.get(q, 0.0), cs.get(q, 0.0))
            (noisy if spread > args.tolerance - 1.0 else violations).append(entry)
        elif c > 0 and b / c > args.tolerance and b - c > args.floor:
            improved.append(entry)

    report = {
        "base": args.base or f"{args.base_ref}:BENCH_DETAIL.json",
        "cur": args.cur,
        "tolerance": args.tolerance,
        "floor_sec": args.floor,
        "n_common": len(common),
        "added": sorted(set(cq) - set(bq)),
        "removed": sorted(set(bq) - set(cq)),
        "sum_base": round(sum(bq[q] for q in common), 3),
        "sum_cur": round(sum(cq[q] for q in common), 3),
        "violations": sorted(violations, key=lambda e: -e["ratio"]),
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
