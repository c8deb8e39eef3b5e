#!/usr/bin/env python3
"""Append a round's bench host-drift control to the CONTROL.json ledger
(round 16, VERDICT r15 #7).

The bench control is a frozen pure-compute lap (2B-row xxhash64 chain);
its wall moves for exactly one reason — the host. BENCH_r15's
adjudication leaned on "~1.4 s nominal" remembered from prose; this
ledger makes drift normalization arithmetic: each round's ctl and total
land as one entry, minCtl accumulates the best wall this control has
ever read (the host's demonstrated capability), and a round's total can
be derated by ctl/minCtl before comparing across rounds.

Usage: scripts/update_control.py BENCH_rN.json N [label]
       (label defaults to "driver"; use "local" for builder-side runs)
"""
import json
import sys


def main() -> None:
    bench_path, rnd = sys.argv[1], int(sys.argv[2])
    label = sys.argv[3] if len(sys.argv) > 3 else "driver"
    d = json.load(open(bench_path))
    p = d.get("parsed", d)
    entry = {
        "round": rnd,
        "source": label,
        "ctl": p.get("ctl"),
        "total": p.get("value"),
    }
    try:
        led = json.load(open("CONTROL.json"))
    except FileNotFoundError:
        led = {"control": "2B-row xxhash64 chain, bit_xor reduce, noop sink "
                          "(Bench.controlLap; frozen since round 15)",
               "entries": []}
    led["entries"] = [e for e in led["entries"]
                      if not (e["round"] == rnd and e["source"] == label)]
    led["entries"].append(entry)
    led["entries"].sort(key=lambda e: (e["round"], e["source"]))
    ctls = [e["ctl"] for e in led["entries"] if e.get("ctl") is not None]
    led["minCtl"] = min(ctls) if ctls else None
    with open("CONTROL.json", "w") as f:
        json.dump(led, f, indent=1)
        f.write("\n")
    print(f"[control] round {rnd} ({label}): ctl={entry['ctl']} "
          f"total={entry['total']} minCtl={led['minCtl']}")


if __name__ == "__main__":
    main()
