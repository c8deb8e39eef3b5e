#!/usr/bin/env python3
"""Splice a fresh full-suite Bench capture into BENCH_LOCAL.json.

Min-lap merging is valid only within one code identity, so:
  - queries listed as CHANGED take the fresh capture's laps alone
    (their old laps measured different code);
  - every other query keeps all laps from both captures and the min.

Usage: splice_bench.py OLD.json FRESH.json NOTE changed_q1 [changed_q2 ...]
       > OUT.json
FRESH.json is a raw GRAFT_BENCH_OUT line (one capture: laps under
"diag", min-lap seconds under "queries").
"""
import sys, json


def main():
    old = json.load(open(sys.argv[1]))
    fresh = json.load(open(sys.argv[2]))
    note = sys.argv[3]
    changed = set(sys.argv[4:])
    # The re-capture rule this script enforces: a CHANGED query must carry
    # fresh-HEAD laps. A changed query missing from the fresh capture would
    # silently keep its stale min-lap — hard error (ADVICE r13).
    missing = changed - set(fresh["queries"])
    if missing:
        print(f"splice_bench: changed query(ies) absent from fresh "
              f"capture: {sorted(missing)}", file=sys.stderr)
        sys.exit(2)
    # Old-only queries either left the suite (should be dropped by hand)
    # or were noise-dropped this capture (legitimately keep their laps) —
    # flag them so neither case passes silently.
    for q in sorted(set(old["queries"]) - set(fresh["queries"])):
        print(f"splice_bench: {q} present in OLD but not in the fresh "
              f"capture — stale min-lap kept; remove it if the query left "
              f"the suite", file=sys.stderr)
    out = dict(old)
    queries, diag = dict(old["queries"]), dict(old.get("diag", {}))
    for q, sec in fresh["queries"].items():
        laps_new = fresh.get("diag", {}).get(q, [])
        if q in changed or q not in queries:
            queries[q] = sec
            diag[q] = laps_new
        else:
            laps = diag.get(q, []) + laps_new
            diag[q] = laps
            ok = [l["sec"] for l in laps if l["sec"] >= 0]
            queries[q] = round(min(ok), 3) if ok else queries[q]
    out["queries"] = dict(sorted(queries.items()))
    out["diag"] = diag
    out["value"] = round(sum(queries.values()), 3)
    out["captures"] = old.get("captures", 1) + 1
    out["note"] = note
    json.dump(out, sys.stdout, indent=1, sort_keys=False)
    print()


if __name__ == "__main__":
    main()
