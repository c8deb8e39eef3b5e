#!/bin/bash
# Cross-mode execution gate: run the full query surface in one local[32]
# JVM and again on local-cluster[4,8,3072] (4 separate executor JVMs,
# real serialization + loopback shuffle), then merge the order-insensitive
# fingerprints into one artifact. A divergence is a serialize/merge defect
# by construction. See graft.CrossCheck.
#
# Usage: scripts/cluster_check.sh OUT.json
#   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) selects the scale.
set -u
out=$1
sf=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
run_gate() {
  echo "[cluster_check] local[32] pass ..." >&2
  sbt -batch "runMain graft.CrossCheck local[32] $sf /tmp/crosscheck_local.json" \
    > /tmp/crosscheck_local.log 2>&1 || { echo "local pass FAILED (see /tmp/crosscheck_local.log)" >&2; return 2; }
  echo "[cluster_check] local-cluster[4,8,3072] pass ..." >&2
  # SPARK_SCALA_VERSION: the in-process Worker builds executor commands via
  # WorkerCommandBuilder, skipping the release scripts that set it (the
  # ClusterChaosSpec lesson).
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    sbt -batch "runMain graft.CrossCheck local-cluster[4,8,3072] $sf /tmp/crosscheck_cluster.json" \
    > /tmp/crosscheck_cluster.log 2>&1 || { echo "cluster pass FAILED (see /tmp/crosscheck_cluster.log)" >&2; return 2; }
  python3 scripts/merge_crosscheck.py \
    /tmp/crosscheck_local.json /tmp/crosscheck_cluster.json > "$out"
}
run_gate
status=$?
# Exit 3 = fingerprints equal but timings noise-dominated (warmOverCold2x
# nonempty): re-run the capture ONCE — transient host steal usually passes;
# a second quality failure ships with the artifact's own diagnosis visible.
if [ "$status" -eq 3 ]; then
  echo "[cluster_check] capture noise-dominated - re-running once" >&2
  run_gate
  status=$?
fi
echo "[cluster_check] wrote $out" >&2
exit $status
