#!/usr/bin/env python3
"""Merge a gate-green BenchLarge run into BENCH_LARGE.json as per-entry seals.

Usage: tools/reseal.py <run.json> [--all | name ...]

For each named entry (default: every entry in the run that has NO
per-entry seal in the committed baseline — the file-level-fallback
set), replace the committed time with the run's measurement and stamp
the run's (calib, calib_str) as that entry's seal. Entries that
already carry a seal are left untouched unless named explicitly or
--all is given. min_outputs floors are NEVER changed here (floors are
exact committed quantities, re-floored only by hand).

Precondition (caller's judgment, printed for the record): the run
must be GATE-GREEN and from a QUIET window — re-sealing from a loud
window bakes its slowness into every budget.
"""
import json
import sys
import collections
import datetime

def main():
    args = [a for a in sys.argv[1:]]
    if not args:
        sys.exit(__doc__)
    run_path, rest = args[0], args[1:]
    seal_all = "--all" in rest
    named = [a for a in rest if a != "--all"]

    run = json.load(open(run_path))
    base_path = "BENCH_LARGE.json"
    base = json.load(open(base_path), object_pairs_hook=collections.OrderedDict)

    if (run["rows"], run["docs"], run["vecs"]) != (base["rows"], base["docs"], base["vecs"]):
        sys.exit(f"size mismatch: run {run['rows']}/{run['docs']}/{run['vecs']} "
                 f"vs baseline {base['rows']}/{base['docs']}/{base['vecs']}")
    run_seals = run.get("run_seals")
    if not run_seals:
        sys.exit("run JSON carries no run_seals field (pre-r15 binary?)")

    if named:
        targets = named
        # an explicit name absent from the committed baseline would
        # silently ADD a brand-new entry+seal (a typo becomes a phantom
        # budget); new entries are added by the BenchLarge merge flow,
        # never by reseal
        unknown = [t for t in targets if t not in base.get("queries", {})]
        if unknown:
            sys.exit("not in the committed baseline (reseal refreshes existing "
                     f"entries, it never adds): {', '.join(sorted(unknown))}")
    else:
        targets = [q for q in run["queries"]
                   if seal_all or q not in base.get("seals", {})]
    missing = [t for t in targets if t not in run["queries"]]
    if missing:
        sys.exit(f"not measured by this run: {', '.join(sorted(missing))}")

    seals = base.setdefault("seals", collections.OrderedDict())
    for name in targets:
        base["queries"][name] = run["queries"][name]
        seals[name] = run_seals[name]
    base["value"] = round(sum(base["queries"].values()), 2)
    stamp = datetime.date.today().isoformat()
    base["merge_note"] = base.get("merge_note", "") + (
        f" | reseal {stamp}: {len(targets)} entries re-sealed from a "
        f"gate-green run at calib {run['calib']} / calib_str {run['calib_str']}.")
    json.dump(base, open(base_path, "w"), indent=0)
    unsealed = [q for q in base["queries"] if q not in base["seals"]]
    print(f"re-sealed {len(targets)} entries at ({run['calib']}, {run['calib_str']}); "
          f"{len(unsealed)} entries still on file-level fallback"
          + (f": {', '.join(sorted(unsealed)[:8])}..." if unsealed else ""))

if __name__ == "__main__":
    main()
