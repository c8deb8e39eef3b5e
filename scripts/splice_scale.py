#!/usr/bin/env python3
"""Splice fresh scale captures into an existing SCALE_r{N}.json.

Per-query code identity is what makes min-lap merging valid: a query whose
code CHANGED since the artifact was captured must carry fresh-HEAD laps
only (the re-capture rule), while an unchanged query's existing points
stay valid at the new HEAD. This script takes the existing artifact plus a
fresh scale_probes-style JSONL and, for every query present in the JSONL,
REPLACES that query's points wholesale (never min-merging across code
identities), then refits the exponent and consecutive-segment marginals
with the same formulas as merge_scale.py.

A partial recapture (fewer tags for a query than the existing artifact
carries) would silently thin that query's curve and refit the exponent on
the remainder — so losing tags is an ERROR unless --allow-partial is
passed explicitly (ADVICE r13).

Usage: splice_scale.py [--allow-partial] EXISTING.json FRESH.jsonl > OUT.json
"""
import sys, json, math

DOCS = {"sf0.1": 1.0, "sf0.3": 3.0, "sf1": 10.0, "sf3": 30.0,
        "sf10": 100.0, "sf30": 300.0}


def refit(points):
    pts = [(DOCS[t], p["minSec"]) for t, p in points.items()
           if p.get("minSec")]
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
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            marginals[f"{x0:g}x->{x1:g}x"] = round(
                (math.log(y1) - math.log(y0)) / (math.log(x1) - math.log(x0)), 3)
    return exp, marginals


def main():
    args = sys.argv[1:]
    allow_partial = "--allow-partial" in args
    if allow_partial:
        args.remove("--allow-partial")
    sys.argv[1:] = args
    out = json.load(open(sys.argv[1]))
    fresh = {}
    for l in open(sys.argv[2]):
        if not l.strip():
            continue
        e = json.loads(l)
        q = e["isolate"]
        tag = e["sf"].rsplit("/", 1)[-1]
        if "error" in e:
            fresh.setdefault(q, {})[tag] = {"error": e["error"]}
            continue
        secs = [lap["sec"] for lap in e["laps"] if lap["sec"] >= 0]
        entry = {
            "minSec": round(min(secs), 3) if secs else None,
            "laps": [round(s, 3) for s in secs],
            "maxJitMs": max(lap["jitMs"] for lap in e["laps"]),
            "maxGcMs": max(lap["gcMs"] for lap in e["laps"]),
        }
        prev = fresh.setdefault(q, {}).get(tag)
        if prev and prev.get("laps"):
            # Same fresh HEAD, repeated capture: min-lap merge applies.
            entry["laps"] = prev["laps"] + entry["laps"]
            entry["minSec"] = round(min(entry["laps"]), 3)
            entry["maxJitMs"] = max(entry["maxJitMs"], prev["maxJitMs"])
            entry["maxGcMs"] = max(entry["maxGcMs"], prev["maxGcMs"])
        fresh[q][tag] = entry
    partial = False
    for q, tags in fresh.items():
        lost = set(out["queries"].get(q, {}).get("points", {})) - set(tags)
        if lost:
            partial = True
            print(f"splice_scale: {q} recapture drops existing scale "
                  f"point(s) {sorted(lost)} — the refit would thin the "
                  f"curve", file=sys.stderr)
    if partial and not allow_partial:
        print("splice_scale: refusing partial recapture (pass "
              "--allow-partial to override)", file=sys.stderr)
        sys.exit(2)
    for q, tags in fresh.items():
        exp, marginals = refit(tags)
        out["queries"][q] = {"points": tags, "exponent": exp,
                             "marginals": marginals}
    json.dump(out, sys.stdout, indent=1, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
