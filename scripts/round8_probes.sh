#!/bin/bash
# Round-8 evidence run: execute every instrument round 7 built and land
# their artifacts (verdict r7 "Next round" #1-#4, #7). Sequential — only
# one sbt can hold the project lock.
#
# Usage: scripts/round8_probes.sh
set -u
cd /root/repo
log() { echo "[round8 $(date +%H:%M:%S)] $*" >&2; }

log "1/5 cross-mode gate -> CLUSTER_r08.json"
scripts/cluster_check.sh CLUSTER_r08.json || log "CLUSTER GATE FAILED"

log "2/5 skew probe (output -> /tmp/skew_probe.log)"
sbt -batch "Test/runMain graft.queries.SkewClusterProbe" \
  > /tmp/skew_probe.log 2>&1 || log "SKEW PROBE FAILED"
grep -E "\[skewprobe\]|SKEW_CLUSTER_PROBE_OK" /tmp/skew_probe.log >&2

log "3/5 recall probe -> RECALL_r08.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.RecallProbe /root/repo/RECALL_r08.json" \
  > /tmp/recall_probe.log 2>&1 || log "RECALL PROBE FAILED"
grep "\[recall\]" /tmp/recall_probe.log >&2

log "4/5 isolation laps -> PROBES_r08.json"
scripts/isolate_probes.sh PROBES_r08.json \
  mm_features dd_substring dd_clusters dd_minhash dd_editdist \
  || log "ISOLATE PROBES FAILED"

log "5/5 scale curves -> SCALE_r08.json"
scripts/scale_probes.sh SCALE_r08.json || log "SCALE PROBES FAILED"

log "done"
