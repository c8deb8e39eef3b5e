#!/bin/bash
# Fresh-JVM isolation probes: run each named query 5 timed laps (after one
# warm-up) in its OWN JVM (sbt `run / fork := true`) via
# GRAFT_BENCH_ISOLATE, and collect the per-lap JSON (wall sec + JIT/GC/
# heap/code-cache deltas) into one artifact. This is the ground-truth
# instrument for suite-bench outliers: a query whose 5 isolation laps are
# flat while its suite number is inflated was polluted by the suite JVM or
# the host, not regressed (the round-5 pipeline_clean_corpus lesson).
#
# Usage: scripts/isolate_probes.sh OUT.json query [query ...]
#   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) selects the scale.
set -u
out=$1; shift
sf=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
printf '{"sf":"%s","probes":[' "$sf" > "$out.tmp"
first=1
for q in "$@"; do
  echo "[probes] $q ..." >&2
  line=$(GRAFT_BENCH_ISOLATE="$q" SPARK_GRAFT_SF_DIR="$sf" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"isolate".*')   # strip sbt's [info] prefix — keep pure JSON
  if [ -z "$line" ]; then
    echo "[probes] $q produced no JSON line" >&2
    line='{"isolate":"'$q'","error":"no output"}'
  fi
  [ "$first" -eq 1 ] || printf ',' >> "$out.tmp"
  first=0
  printf '%s' "$line" >> "$out.tmp"
done
printf ']}\n' >> "$out.tmp"
mv "$out.tmp" "$out"
echo "[probes] wrote $out" >&2
