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

DOCS = {"sf0.1": 1.0, "sf0.3": 3.0, "sf1": 10.0, "sf3": 30.0,
        "sf10": 100.0, "sf30": 300.0}  # relative corpus scale

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
        marginals = {}
        if len(pts) >= 2:
            pts.sort()
            xs = [math.log(x) for x, _ in pts]
            ys = [math.log(y) for _, y in pts]
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            denom = sum((x - mx) ** 2 for x in xs)
            exp = round(sum((x - mx) * (y - my)
                            for x, y in zip(xs, ys)) / denom, 3)
            # consecutive-segment slopes: a rising tail (last marginal >>
            # global fit) means the curve is compounding, not flattening —
            # the signal the global least-squares fit averages away
            for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
                marginals[f"{x0:g}x->{x1:g}x"] = round(
                    (math.log(y1) - math.log(y0)) / (math.log(x1) - math.log(x0)), 3)
        out["queries"][q] = {"points": tags, "exponent": exp,
                             "marginals": marginals}
    json.dump(out, sys.stdout, indent=1, sort_keys=True)
    print()

if __name__ == "__main__":
    main()
