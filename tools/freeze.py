#!/usr/bin/env python3
"""Freeze protocol helper (round 14+).

Usage: python3 tools/freeze.py run1.json run2.json run3.json

Each argument is a saved copy of /tmp/graft_bench.json (the FULL-name
bench line) from one back-to-back run at the freeze scale factor.
Emits, in the repo root:
  - BENCH_FREEZE.json   {entry: median_seconds} — the per-entry frozen
    medians Bench.scala reads to compute the stdout `diag` ratios;
  - a markdown freeze table on stdout, ready to paste into BASELINE.md.
Also reminds you to copy /tmp/graft_bench_stagesig.json (from the LAST
run — signatures are per-bytecode, any of the three is fine since the
freeze protocol forbids editing src mid-freeze) to BENCH_STAGESIG.json.

Median convention matches every prior freeze: per-entry median of the
runs; the headline number is the SUM of per-entry medians.
"""
import json
import statistics
import sys

def main():
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if len(runs) < 2:
        sys.exit("need >= 2 run files")
    names = sorted(runs[0]["queries"])
    for r in runs[1:]:
        if sorted(r["queries"]) != names:
            sys.exit("runs cover different entry sets — same bytecode required")
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"runs span scale factors {sfs} — medians would blend corpora")
    med = {n: round(statistics.median(r["queries"][n] for r in runs), 3)
           for n in names}
    # validate controls BEFORE writing any output: a run file missing
    # its control would otherwise fail at the summary print with
    # BENCH_FREEZE.json already on disk (round-14 review)
    controls = [r.get("control") for r in runs]
    bad = [p for p, c in zip(sys.argv[1:], controls)
           if not isinstance(c, (int, float))]
    if bad:
        sys.exit(f"run files missing a numeric 'control': {bad} — "
                 "refusing to freeze without the ambient yardstick")
    # second (heavy) probe, round 18: optional for pre-round-18 run
    # files, stamped when every run carries it
    controls2 = [r.get("control2") for r in runs]
    have2 = all(isinstance(c, (int, float)) for c in controls2)
    with open("BENCH_FREEZE.json", "w") as f:
        # `_sf` stamps the corpus the medians were measured at; Bench
        # refuses to compute diag verdicts (or clobber the round's repo
        # diag artifact) when a run's sf differs from this stamp.
        # `_control`/`_control2` stamp the frozen ambient yardsticks so
        # the adjudicator can fit the 2-point ambient model (light =
        # scheduler-dominated, heavy = compute-dominated) per run.
        out = dict(med)
        out["_sf"] = sfs.pop()
        out["_control"] = round(statistics.median(controls), 3)
        if have2:
            out["_control2"] = round(statistics.median(controls2), 3)
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    total = round(sum(med.values()), 1)
    totals = " / ".join(f"{round(sum(r['queries'].values()), 1)}" for r in runs)
    print(f"per-query median sum **{total} s, {len(names)} entries**; "
          f"run totals {totals}; controls {controls} "
          f"(median {statistics.median(controls)})"
          + (f"; heavy controls {controls2} "
             f"(median {statistics.median(controls2)})" if have2 else ""))
    print()
    print("| entry | median s | runs |")
    print("|---|---|---|")
    for n in names:
        vals = " / ".join(f"{r['queries'][n]:.2f}" for r in runs)
        print(f"| {n} | {med[n]:.2f} | {vals} |")
    print("\n[freeze] wrote BENCH_FREEZE.json — now copy "
          "/tmp/graft_bench_stagesig.json to BENCH_STAGESIG.json and "
          "commit both with the BASELINE.md table")

if __name__ == "__main__":
    main()
