#!/usr/bin/env bash
# Repetition harness for the flake-prone suites — the analogue of the
# reference's main/test-mr-many.sh:8-23 (run the chaos/timing tests N
# times; any nondeterministic failure shows up as a red run).
#
# Usage: scripts/test-many.sh [N]   (default 5)
set -u
cd "$(dirname "$0")/.."
runs=${1:-5}
suites="graft.ChaosSpec graft.mr.ClusterChaosSpec graft.streaming.StreamingSpec graft.mr.MRJobSpec"
pass=0
for i in $(seq 1 "$runs"); do
  echo "=== run $i/$runs ==="
  if sbt -batch "testOnly $suites" >"/tmp/test-many-$i.log" 2>&1; then
    echo "run $i: PASS"
    pass=$((pass + 1))
  else
    echo "run $i: FAIL (see /tmp/test-many-$i.log)"
  fi
done
echo "passed $pass/$runs"
[ "$pass" -eq "$runs" ]
