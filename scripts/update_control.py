#!/usr/bin/env python3
"""Append a round's bench host-drift controls to the CONTROL.json ledger
(round 16, VERDICT r15 #7; two-axis since round 17, VERDICT r16 #2).

Axis 1 (ctl): a frozen pure-compute lap (2B-row xxhash64 chain). Its
wall moves for exactly one reason — CPU cycle speed (steal, thermal,
co-tenant compute load).

Axis 2 (ctl2, round 17): a frozen small shuffle (50M rows repartitioned
across 64 partitions — ~400 MB of shuffle write+read, 128 tasks of
scheduling). Round 16 proved the compute axis alone is blind:
BENCH_LOCAL read 108.34 s at ctl 0.90 vs the driver's 81.93 s at ctl
0.89 — near-identical compute control, 26 s apart on totals, because
co-tenant SCHEDULING moves a 111-query suite without moving a
single-stage arithmetic chain. ctl2 feels that axis; ctlSpread (max−min
over the 3 compute-control laps) flags instability DURING the control
window itself.

ADJUDICATION NOTE (why `total × minCtl/ctl` alone is NOT a cross-round
verdict): the compute control normalizes one axis of at least three
(CPU speed, scheduling latency, IO contention). r16's own ledger would
"prove" the r16 local run slower than r15 on that arithmetic
(108.34 × 0.90/0.90 > 104.70 × 0.90/1.76) while the per-query table
refutes it. Read the axes TOGETHER: ctl inflated ⇒ derate the total by
ctl/minCtl before comparing; ctl flat + ctl2 inflated ⇒ the delta is
scheduling/IO, expect uniform per-query inflation, adjudicate on
per-query ratios against their historical spread; both flat ⇒ the code
moved, the total is real. A query-level regression claim always needs
the per-query diag (jitMs/gcMs) and, when contested, an isolation lap.

Usage: scripts/update_control.py BENCH_rN.json N [label]
       (label defaults to "driver"; use "local" for builder-side runs)
"""
import json
import sys


def main() -> None:
    bench_path, rnd = sys.argv[1], int(sys.argv[2])
    label = sys.argv[3] if len(sys.argv) > 3 else "driver"
    d = json.load(open(bench_path))
    p = d.get("parsed", d) or {}
    # Two artifact shapes: the driver's BENCH_rN.json carries the COMPACT
    # line (top-level ctl/ctl2/ctlSpread), a GRAFT_BENCH_OUT full line
    # nests them under control/control2.
    ctl = p.get("ctl", (p.get("control") or {}).get("sec"))
    ctl2 = p.get("ctl2", (p.get("control2") or {}).get("sec"))
    spread = p.get("ctlSpread", (p.get("control") or {}).get("spread"))
    # Bench emits -1.0 when a control lap FAILED (ADVICE r17): a failed
    # control is "no reading", not "the fastest host ever" — record it as
    # null so it can never be min'ed into minCtl/minCtl2 below.
    if ctl is not None and ctl <= 0:
        ctl = None
    if ctl2 is not None and ctl2 <= 0:
        ctl2 = None
    if spread is not None and spread < 0:
        spread = None
    entry = {
        "round": rnd,
        "source": label,
        "ctl": round(ctl, 2) if ctl is not None else None,
        "ctl2": round(ctl2, 2) if ctl2 is not None else None,
        "ctlSpread": round(spread, 2) if spread is not None else None,
        "total": round(p["value"], 2) if p.get("value") is not None else None,
    }
    try:
        led = json.load(open("CONTROL.json"))
    except FileNotFoundError:
        led = {"entries": []}
    led["control"] = ("2B-row xxhash64 chain, bit_xor reduce, noop sink "
                      "(Bench.controlLap; frozen since round 15)")
    led["control2"] = ("50M-row hash repartition over 64 partitions, "
                       "bit_xor reduce, noop sink (Bench.shuffleControlLap; "
                       "frozen since round 17 — the scheduling/IO axis)")
    led["adjudication"] = (
        "total*minCtl/ctl alone is NOT a cross-round verdict: ctl "
        "normalizes CPU speed only (r16 evidence: 26 s apart at equal "
        "ctl). Read ctl, ctl2 and ctlSpread together; contested "
        "per-query claims go to isolation laps.")
    led["entries"] = [e for e in led["entries"]
                      if not (e["round"] == rnd and e["source"] == label)]
    led["entries"].append(entry)
    led["entries"].sort(key=lambda e: (e["round"], e["source"]))
    # Defensive re-filter over HISTORICAL entries too: a sentinel that
    # slipped into the ledger before this guard existed must not poison
    # the floor (ADVICE r17 — non-positive means "control failed").
    ctls = [e["ctl"] for e in led["entries"]
            if e.get("ctl") is not None and e["ctl"] > 0]
    ctl2s = [e.get("ctl2") for e in led["entries"]
             if e.get("ctl2") is not None and e["ctl2"] > 0]
    led["minCtl"] = min(ctls) if ctls else None
    led["minCtl2"] = min(ctl2s) if ctl2s else None
    with open("CONTROL.json", "w") as f:
        json.dump(led, f, indent=1)
        f.write("\n")
    print(f"[control] round {rnd} ({label}): ctl={entry['ctl']} "
          f"ctl2={entry['ctl2']} spread={entry['ctlSpread']} "
          f"total={entry['total']} minCtl={led['minCtl']} "
          f"minCtl2={led['minCtl2']}")


if __name__ == "__main__":
    main()
