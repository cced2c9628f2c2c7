#!/usr/bin/env python3
"""Bench-regression gate (VERDICT r12 #3): diff a fresh BENCH_FULL.json
against the last COMMITTED one and fail on unexplained per-query
regressions, so a close-out can never again claim "no regression"
without the diff that proves it (r12 shipped q57 at 1.8x under exactly
that claim).

Usage:
    tools/bench_diff.py [--new BENCH_FULL.json] [--base <ref>]
                        [--allow q_name=reason ...]

  --base   git ref holding the reference BENCH_FULL.json
           (default: HEAD — the last committed full battery)
  --new    fresh battery JSON (default: ./BENCH_FULL.json, which a
           just-finished full `graft.Bench` run leaves in the cwd)
  --allow  exempt a named query WITH a justification; every allowance
           is printed, so the snapshot commit quotes it

Compares the `queries_median` maps (medians, not mins: a min hides a
regression behind one lucky iteration). A query FAILS if
  new/old > 1.30  AND  new - old > 0.10 s
(the absolute floor keeps sub-100 ms noise on tiny queries out of the
gate; they are still REPORTED). Exit 1 on any unallowed failure.
New/removed queries and the r1-comparable subtotal ratio are reported
for the close-out note.
"""
import argparse
import json
import subprocess
import sys

RATIO = 1.30
ABS_FLOOR = 0.10
# ADVICE r13 #1: the drift correction normalizes per-query ratios by the
# battery median, which makes the per-query gate blind to a UNIFORM real
# regression (slow everything 1.5x and every corrected ratio is 1.0).
# The battery median itself is therefore gated too: above this, the diff
# fails unless an explicit --battery-allow names the battery-level cause
# (the measured r13 host-drift series topped out at 1.119 same-code;
# 1.15 leaves headroom for that without waving through a real 1.2x).
BATTERY_RATIO = 1.15


def load_base(ref: str) -> dict:
    out = subprocess.run(["git", "show", f"{ref}:BENCH_FULL.json"],
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"bench_diff: cannot read BENCH_FULL.json at {ref}: {out.stderr.strip()}")
    return json.loads(out.stdout)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", default="BENCH_FULL.json")
    ap.add_argument("--base", default="HEAD")
    ap.add_argument("--allow", action="append", default=[],
                    metavar="QUERY=REASON")
    ap.add_argument("--allow-file", default=None,
                    help="file of QUERY=REASON lines (committed alongside the "
                         "battery so the justification is part of the record); "
                         "'#' comments and blank lines ignored; missing file ok. "
                         "Must carry a '# base: <commit>' stamp matching --base "
                         "(ADVICE r13 #2): allowances are per-battery, and a "
                         "stale file must fail loudly, not exempt silently.")
    ap.add_argument("--battery-allow", default=None, metavar="REASON",
                    help="accept a battery-median ratio above the "
                         f"{BATTERY_RATIO}x gate WITH a named battery-level "
                         "cause (quoted in the close-out note)")
    ap.add_argument("--window-allow", default=None, metavar="REASON",
                    help="accept an inflated SMALL-QUERY stratum (stamped or "
                         "computed) WITH a named cause — without it the diff "
                         "refuses the battery as baseline evidence "
                         "(VERDICT r15 #1: sub-second queries are the drift "
                         "canaries the big-query stamp cannot see)")
    args = ap.parse_args()

    if args.allow_file:
        try:
            lines = open(args.allow_file).read().splitlines()
        except FileNotFoundError:
            lines = None
        if lines is not None:
            # Stamp check (ADVICE r13 #2): the file names the base commit
            # its allowances were measured against. A mismatch means the
            # file is left over from an older battery — entries then fail
            # as if unallowed instead of rubber-stamping a new regression.
            stamps = [ln.split(":", 1)[1].strip() for ln in lines
                      if ln.replace(" ", "").lower().startswith("#base:")]
            want = subprocess.run(["git", "rev-parse", "--short", args.base],
                                  capture_output=True, text=True).stdout.strip()
            if not stamps:
                sys.exit(f"bench_diff: {args.allow_file} has no '# base: <commit>' "
                         f"stamp — stamp it with the battery it was measured "
                         f"against (currently {want})")
            if want and stamps[0] != want:
                print(f"bench_diff: STALE allow file {args.allow_file} "
                      f"(stamped base {stamps[0]}, diffing against {want}) — "
                      f"ignoring its {sum(1 for ln in lines if ln.strip() and not ln.strip().startswith('#'))} entries")
            else:
                for ln in lines:
                    ln = ln.strip()
                    if ln and not ln.startswith("#"):
                        args.allow.append(ln)

    allow = {}
    for a in args.allow:
        if "=" not in a:
            sys.exit(f"bench_diff: --allow needs q_name=reason, got {a!r}")
        q, reason = a.split("=", 1)
        if not reason.strip():
            sys.exit(f"bench_diff: --allow {q} has an EMPTY reason — name it")
        allow[q] = reason.strip()

    new = json.load(open(args.new))
    base = load_base(args.base)
    nq, bq = new["queries_median"], base["queries_median"]

    # Quiet-window stamps (VERDICT r14 #3, r15 #1): graft.Bench runs a
    # STRATIFIED spot subset (sub-second drift canaries + big
    # amortizers) against the committed mins BEFORE and AFTER the full
    # battery. The r15 lesson: a battery stamped 1.042 "quiet" on big
    # queries carried a 1.28x median on its sub-second members — the
    # additive host drift the amortizers cannot see. An inflated SMALL
    # stratum (either pass) refuses the battery as baseline evidence
    # unless --window-allow names the cause.
    window_fail = False
    any_stamp = False
    for prefix, label in (("spot", "pre"), ("spot_post", "post")):
        overall = new.get(f"{prefix}_window_ratio")
        if overall is None:
            continue
        any_stamp = True
        small = new.get(f"{prefix}_small_ratio")
        big = new.get(f"{prefix}_big_ratio")
        parts = f"overall {overall:.3f}"
        if small is not None:
            parts += f", small {small:.3f}"
        if big is not None:
            parts += f", big {big:.3f}"
        bad_small = small is not None and small >= 1.3
        bad_overall = overall >= 1.3
        if bad_small or bad_overall:
            which = "SMALL-query stratum" if bad_small else "window"
            print(f"WINDOW: {label}-battery stamp {parts} — {which} inflated; "
                  f"this battery was measured in a bad host window and must "
                  f"not become the committed baseline")
            window_fail = True
        else:
            print(f"quiet-window stamp ({label}): {parts} (quiet)")
    if not any_stamp:
        print("WARNING: battery carries no quiet-window stamp "
              "(old graft.Bench, SPARK_GRAFT_SPOT=skip, or no reference "
              "battery at run time)")

    added = sorted(set(nq) - set(bq))
    removed = sorted(set(bq) - set(nq))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED queries ({len(removed)}): {', '.join(removed)}")

    rows = []
    for q in sorted(set(nq) & set(bq)):
        o, n = bq[q], nq[q]
        if o <= 0 or n <= 0:
            continue  # errored runs carry -1; n_failed is its own gate
        rows.append((n / o, n - o, q, o, n))

    # Session-drift correction (round-13 finding: three same-code
    # batteries in one afternoon read battery-median ratios 1.000 /
    # 1.048 / 1.072 with a 1.3-1.5x tail on sub-second queries — host
    # conditions move the WHOLE battery, invisibly from in-guest). A
    # query fails only if it regressed >1.3x BOTH raw and relative to
    # the battery's own median ratio: a code regression is an OUTLIER
    # against the session's drift, not a rider on it.
    med_ratio = sorted(r for r, *_ in rows)[len(rows) // 2] if rows else 1.0
    if abs(med_ratio - 1.0) > 0.03:
        print(f"session drift: battery median ratio {med_ratio:.3f} — "
              f"per-query failures below are drift-corrected by it")

    # Computed stratum check over the WHOLE battery (VERDICT r15 #1):
    # the stamps above certify the spot subset; this recomputes the
    # same signal from every shared query, so it also catches what a
    # pre-r16 battery's single stamp missed (the r15 validation case:
    # 70/222 sub-second queries >1.5x while the stamp read 1.042).
    # Only queries above the ABS floor participate (a 30 ms query's
    # ratio is pure noise).
    small_rs = sorted(r for r, _, _, o, _ in rows if ABS_FLOOR < o < 1.0)
    big_rs = sorted(r for r, _, _, o, _ in rows if o >= 1.0)
    if small_rs and big_rs:
        sm, bm = small_rs[len(small_rs) // 2], big_rs[len(big_rs) // 2]
        n_hot = sum(1 for r in small_rs if r > 1.5)
        print(f"computed strata over shared queries: sub-second median "
              f"{sm:.3f} ({len(small_rs)} queries, {n_hot} over 1.5x), "
              f"big-query median {bm:.3f} ({len(big_rs)})")
        if sm >= 1.3 and bm < BATTERY_RATIO:
            print(f"WINDOW: sub-second stratum moved {sm:.3f}x while the "
                  f"big stratum is quiet ({bm:.3f}) — the additive-drift "
                  f"signature; per-query medians in this battery are not "
                  f"trustworthy for queries under ~2 s")
            window_fail = True
    # Whole-battery gate (ADVICE r13 #1): a uniform regression moves the
    # median itself, which the per-query drift correction cannot see.
    battery_fail = med_ratio > BATTERY_RATIO and not args.battery_allow
    if med_ratio > BATTERY_RATIO and args.battery_allow:
        print(f"  ALLOW battery: median ratio {med_ratio:.3f} > {BATTERY_RATIO} "
              f"— {args.battery_allow}")

    failures, noted = [], []
    for ratio, delta, q, o, n in sorted(rows, reverse=True):
        corrected = ratio / med_ratio
        if ratio > RATIO and corrected > RATIO and delta > ABS_FLOOR:
            (noted if q in allow else failures).append((ratio, corrected, q, o, n))
        elif ratio > RATIO and delta > ABS_FLOOR:
            print(f"  note  {q}: {o:.3f} -> {n:.3f} s ({ratio:.2f}x raw, "
                  f"{corrected:.2f}x drift-corrected — moved with the battery)")
        elif ratio > RATIO:
            print(f"  note  {q}: {o:.3f} -> {n:.3f} s ({ratio:.2f}x, "
                  f"+{delta*1000:.0f} ms — under the {ABS_FLOOR*1000:.0f} ms floor)")

    for ratio, corrected, q, o, n in noted:
        print(f"  ALLOW {q}: {o:.3f} -> {n:.3f} s ({ratio:.2f}x raw, "
              f"{corrected:.2f}x corrected) — {allow[q]}")
    for ratio, corrected, q, o, n in failures:
        print(f"  FAIL  {q}: {o:.3f} -> {n:.3f} s ({ratio:.2f}x raw, "
              f"{corrected:.2f}x drift-corrected)")

    sub_o = base.get("baseline_comparable_r1_query_subtotal")
    sub_n = new.get("baseline_comparable_r1_query_subtotal")
    if sub_o and sub_n:
        print(f"r1-comparable subtotal: {sub_o:.2f} -> {sub_n:.2f} s "
              f"({sub_n / sub_o:.3f}x round-over-round)")
    med = sorted(r for r, *_ in rows)
    if med:
        print(f"median per-query ratio over {len(med)} shared queries: "
              f"{med[len(med) // 2]:.3f}")

    if window_fail and args.window_allow:
        print(f"  ALLOW window: inflated small-query stratum — {args.window_allow}")
        window_fail = False
    if battery_fail:
        print(f"bench_diff: BATTERY median ratio {med_ratio:.3f} > {BATTERY_RATIO} "
              f"— a whole-battery regression (or name the battery-level cause "
              f"with --battery-allow)")
    if window_fail:
        print("bench_diff: WINDOW — the sub-second stratum is inflated while "
              "the big stratum is quiet; re-measure in a quiet window (or "
              "name the cause with --window-allow)")
    if failures:
        print(f"bench_diff: {len(failures)} regression(s) >{RATIO}x "
              f"(+>{ABS_FLOOR}s) — justify with --allow or fix before committing")
    if failures or battery_fail or window_fail:
        return 1
    print("bench_diff: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
