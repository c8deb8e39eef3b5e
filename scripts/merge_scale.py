#!/usr/bin/env python3
"""Merge scale-probe isolation lines into SCALE_r{N}.json with fitted
time-vs-rows exponents.

Input: JSONL from scripts/scale_probes.sh — one Bench ISOLATE line per
(scale, query), each {"isolate": q, "sf": dir, "laps": [{sec, jitMs,...}]}.

Fit: least-squares slope of log(minSec) vs log(docRows) over the scale
points — exponent ~= 1 means the df-cap / hash-join shape is holding
(linear in corpus size); >> 1 means superlinear blowup.
"""
import sys, json, math

DOCS = {"sf0.1": 1.0, "sf0.3": 3.0, "sf1": 10.0, "sf3": 30.0}  # relative corpus scale

def main():
    lines = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
    per_q = {}
    for e in lines:
        q = e["isolate"]
        tag = e["sf"].rsplit("/", 1)[-1]
        if "error" in e:
            per_q.setdefault(q, {})[tag] = {"error": e["error"]}
            continue
        secs = [l["sec"] for l in e["laps"] if l["sec"] >= 0]
        per_q.setdefault(q, {})[tag] = {
            "minSec": round(min(secs), 3) if secs else None,
            "laps": [round(s, 3) for s in secs],
            "maxJitMs": max(l["jitMs"] for l in e["laps"]),
            "maxGcMs": max(l["gcMs"] for l in e["laps"]),
        }
    out = {"scales": DOCS, "queries": {}}
    for q, tags in sorted(per_q.items()):
        pts = [(DOCS[t], tags[t]["minSec"]) for t in tags
               if tags[t].get("minSec")]
        exp = None
        if len(pts) >= 2:
            xs = [math.log(x) for x, _ in pts]
            ys = [math.log(y) for _, y in pts]
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            denom = sum((x - mx) ** 2 for x in xs)
            exp = round(sum((x - mx) * (y - my)
                            for x, y in zip(xs, ys)) / denom, 3)
        out["queries"][q] = {"points": tags, "exponent": exp}
    json.dump(out, sys.stdout, indent=1, sort_keys=True)
    print()

if __name__ == "__main__":
    main()
