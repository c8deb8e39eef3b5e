#!/usr/bin/env python3
"""Merge two CrossCheck JSON files (local[32] vs local-cluster) into the
round's CLUSTER artifact: per-query fingerprint equality + wall times.

Usage: python3 scripts/merge_crosscheck.py LOCAL.json CLUSTER.json > OUT.json
Exit 1 if any query errs or fingerprints diverge across modes.
"""
import sys, json

def main():
    local = json.load(open(sys.argv[1]))
    cluster = json.load(open(sys.argv[2]))
    lq, cq = local["queries"], cluster["queries"]
    names = sorted(set(lq) | set(cq))
    out = {
        "localMode": local["mode"], "clusterMode": cluster["mode"],
        "sf": local["sf"], "queries": {}, "equal": 0, "diverged": [],
        "errors": [],
    }
    for n in names:
        a, b = lq.get(n), cq.get(n)
        fp = lambda e: (e["rows"], e["fpsum"], e["fpxor"]) if e else None
        err = (a or {}).get("err") or (b or {}).get("err")
        match = a is not None and b is not None and err is None and fp(a) == fp(b)
        out["queries"][n] = {
            "rows": a["rows"] if a else None,
            "match": match,
            "localSec": round(a["sec"], 3) if a else None,
            "clusterSec": round(b["sec"], 3) if b else None,
            "clusterSecCold": round(b["secCold"], 3) if b else None,
            # steal-detector re-laps (see CrossCheck): >0 means the first
            # warm lap was slower than the cold lap and got re-measured
            "relaps": ((a or {}).get("relaps", 0) + (b or {}).get("relaps", 0)),
            "err": err,
        }
        if match:
            out["equal"] += 1
        elif err:
            out["errors"].append(n)
        else:
            out["diverged"].append(n)
    out["total"] = len(names)
    out["localTotalSec"] = round(sum(e["sec"] for e in lq.values()), 1)
    out["clusterTotalSec"] = round(sum(e["sec"] for e in cq.values()), 1)
    # Capture-quality gate: queries whose best cluster warm lap STILL
    # exceeds 2x their own cold lap after the steal detector's re-laps —
    # nonempty means the capture is noise-dominated and should be re-run.
    out["warmOverCold2x"] = sorted(
        n for n, e in cq.items()
        if e["sec"] > 2 * e["secCold"] and e["sec"] > 0.3)
    out["relapsTotal"] = sum(e.get("relaps", 0) for e in list(lq.values()) + list(cq.values()))
    json.dump(out, sys.stdout, indent=1, sort_keys=True)
    print()
    ok = out["equal"] == out["total"]
    print(f"== {out['equal']}/{out['total']} fingerprint-equal across modes; "
          f"diverged={out['diverged']} errors={out['errors']}", file=sys.stderr)
    if not ok:
        sys.exit(1)
    # Distinct exit for a correctness-green but noise-dominated capture
    # (best warm lap still >2x its own cold lap after the steal
    # detector's re-laps): callers re-run the timing capture instead of
    # shipping it. Review r11: previously this list was advisory prose
    # only and a noise-dominated artifact exited 0.
    if out["warmOverCold2x"]:
        print(f"== capture quality FAILED: warmOverCold2x="
              f"{out['warmOverCold2x']} - timings noise-dominated, re-run",
              file=sys.stderr)
        sys.exit(3)
    sys.exit(0)

if __name__ == "__main__":
    main()
