#!/bin/bash
# Round evidence run: execute every instrument and land its artifact.
# Sequential — only one sbt can hold the project lock.
#
# Usage: scripts/round_probes.sh R   (R = round number, e.g. 10)
#
# Unlike round8_probes.sh (which always exited 0 — ADVICE r8/r9), any
# failed gate sets a flag and the script exits 1, so CI / the driver can
# see a red evidence run.
set -u
r=${1:?usage: round_probes.sh ROUND_NUMBER}
cd /root/repo
fail=0
log() { echo "[round$r $(date +%H:%M:%S)] $*" >&2; }

log "1/14 cross-mode gate -> CLUSTER_r$r.json"
scripts/cluster_check.sh "CLUSTER_r$r.json" || { log "CLUSTER GATE FAILED"; fail=1; }

log "2/14 skew probe (output -> /tmp/skew_probe.log)"
sbt -batch "Test/runMain graft.queries.SkewClusterProbe" \
  > /tmp/skew_probe.log 2>&1 || { log "SKEW PROBE FAILED"; fail=1; }
grep -E "\[skewprobe\]|SKEW_CLUSTER_PROBE_OK" /tmp/skew_probe.log >&2 || true

log "3/14 isolation laps -> PROBES_r$r.json"
scripts/isolate_probes.sh "PROBES_r$r.json" \
  mm_features dd_substring dd_clusters dd_minhash dd_editdist \
  dd_decontaminate_fuzzy \
  || { log "ISOLATE PROBES FAILED"; fail=1; }

log "4/14 scale curves -> SCALE_r$r.json"
scripts/scale_probes.sh "SCALE_r$r.json" || { log "SCALE PROBES FAILED"; fail=1; }

# After the scale step so the staged 3x/10x corpora exist: recall is
# measured on the full scale curve (sf0.1 plus the staged points).
log "5/14 recall probe (scale curve) -> RECALL_r$r.json"
sbt -batch "runMain graft.RecallProbe /root/repo/RECALL_r$r.json /root/testdata/sf0.1 /tmp/graft_scale/sf0.3 /tmp/graft_scale/sf1" \
  > /tmp/recall_probe.log 2>&1 || { log "RECALL PROBE FAILED"; fail=1; }
grep "\[recall\]" /tmp/recall_probe.log >&2 || true

# Differential gate for the fuzzy sketch cut (ADVICE r14): at the 30x
# staging the cut genuinely engages (~1M raw candidate pairs); cut-on
# output must equal cut-off output, else the lossy regime regressed.
log "6/14 fuzzy sketch-cut differential -> FUZZYCUT_r$r.json"
sbt -batch "Test/runMain graft.queries.FuzzyCutCheck /tmp/graft_scale/sf3 /root/repo/FUZZYCUT_r$r.json" \
  > /tmp/fuzzycut.log 2>&1 || { log "FUZZY CUT CHECK FAILED"; fail=1; }
grep "\[fuzzycut\]" /tmp/fuzzycut.log >&2 || true

# Substring output-growth curve (VERDICT r14 #4): pair-vs-cut span
# cardinality per scale point, pair form through 100x, cut form through
# 300x — "intrinsic to pair semantics" committed as a curve.
log "7/14 substring span-growth -> SUBSTR_r$r.json"
sbt -batch "Test/runMain graft.queries.SubstrProbe /root/repo/SUBSTR_r$r.json /tmp/graft_scale/sf0.1 /tmp/graft_scale/sf0.3 /tmp/graft_scale/sf1 /tmp/graft_scale/sf3 /tmp/graft_scale/sf10 cutonly:/tmp/graft_scale/sf30" \
  > /tmp/substr_probe.log 2>&1 || { log "SUBSTR PROBE FAILED"; fail=1; }
grep "\[substrprobe\]" /tmp/substr_probe.log >&2 || true

# Static join-strategy census (the preferSortMergeJoin=false conf is
# session-wide — a strategy flip on any heavy query must surface as an
# artifact diff, not a silent plan change; ADVICE r13).
# Differential gate for the fuzzy hot-bucket coarsening (round 16):
# forced-on vs forced-off row identity at the 100x staging, plus the
# guard inputs (mass, signed docs, adaptive threshold) as an artifact.
log "8/14 fuzzy coarse differential -> FUZZYCOARSE_r$r.json"
# sf20 (round 17, VERDICT r16 #4): the mid-bracket point for the
# 64-pairs/doc guard constant — sf10 sits at ~23 pairs/doc, the
# pre-floor 300x collapse at 127.
sbt -batch "Test/runMain graft.queries.FuzzyCoarseCheck /root/repo/FUZZYCOARSE_r$r.json /tmp/graft_scale/sf10 /tmp/graft_scale/sf20" \
  > /tmp/fuzzycoarse.log 2>&1 || { log "FUZZY COARSE CHECK FAILED"; fail=1; }
grep "\[fuzzycoarse\]" /tmp/fuzzycoarse.log >&2 || true

# g-partition skew census for the substring_cut window form (round 16,
# VERDICT r15 #3): rows-per-g max/p99/p999 at the far stagings decide
# window-vs-combinable form on a measurement.
log "9/14 substring g-skew census -> SUBSTRSKEW_r$r.json"
# stream:N points (round 17, VERDICT r16 #5): the WindowExec group
# alone at 2M and 5M rows in ONE g — production license-header density,
# generated as the raw position stream instead of full documents.
sbt -batch "Test/runMain graft.queries.SubstrSkewProbe /root/repo/SUBSTRSKEW_r$r.json /tmp/graft_scale/sf3 /tmp/graft_scale/sf10 /tmp/graft_scale/sf30 planted:200000 planted:500000 stream:2000000 stream:5000000" \
  > /tmp/substrskew.log 2>&1 || { log "SUBSTR SKEW PROBE FAILED"; fail=1; }
grep "\[substrskew\]" /tmp/substrskew.log >&2 || true

log "10/14 join-strategy census -> SMJ_r$r.txt"
sbt -batch "Test/runMain graft.queries.SmjScan" > /tmp/smj_scan.log 2>&1 \
  || { log "SMJ CENSUS FAILED"; fail=1; }
grep "\[smjscan\]" /tmp/smj_scan.log > "SMJ_r$r.txt" || { log "SMJ CENSUS EMPTY"; fail=1; }
grep -q "ERROR" "SMJ_r$r.txt" && { log "SMJ CENSUS HAS ERRORS"; fail=1; }
cat "SMJ_r$r.txt" >&2

# Staged-basis crossover (round 17, VERDICT r16 #1): recompute vs
# staged walls per corpus decade + the reuse count R* where staging
# pays — the SCALE annex for the signature families' deployment form.
log "11/14 staged-basis crossover -> STAGED_r$r.json"
sbt -batch "Test/runMain graft.queries.StagedBasisProbe /root/repo/STAGED_r$r.json /tmp/graft_scale/sf0.1 /tmp/graft_scale/sf1 /tmp/graft_scale/sf10" \
  > /tmp/staged_basis.log 2>&1 || { log "STAGED BASIS PROBE FAILED"; fail=1; }
grep "\[stagedbasis\]" /tmp/staged_basis.log >&2 || true

# dd_embed_bucketed cascade-at-tau=0.45 A/B (round 17, VERDICT r16 #6):
# forced-cascade vs shipped-skip walls — the ship-or-fence measurement.
log "12/14 embed fence A/B -> EMBEDFENCE_r$r.json"
sbt -batch "Test/runMain graft.queries.EmbedFenceProbe /root/repo/EMBEDFENCE_r$r.json /tmp/graft_scale/sf0.3 /tmp/graft_scale/sf1 /tmp/graft_scale/sf3" \
  > /tmp/embed_fence.log 2>&1 || { log "EMBED FENCE PROBE FAILED"; fail=1; }
grep "\[embedfence\]" /tmp/embed_fence.log >&2 || true

# Embedding staged-signature crossover (round 18, VERDICT r17 #2): the
# sharedEmbedSigs dispatch's recompute/staged walls + R* per corpus
# decade — the embedding twin of step 11.
log "13/14 embed staged crossover -> EMBEDSTAGED_r$r.json"
sbt -batch "Test/runMain graft.queries.EmbedStagedProbe /root/repo/EMBEDSTAGED_r$r.json /tmp/graft_scale/sf0.1 /tmp/graft_scale/sf1 /tmp/graft_scale/sf3" \
  > /tmp/embed_staged.log 2>&1 || { log "EMBED STAGED PROBE FAILED"; fail=1; }
grep "\[embedstaged\]" /tmp/embed_staged.log >&2 || true

# IVF staged-index crossover (round 19, VERDICT r18 #1): the
# sharedIvfServing dispatch's recompute/staged walls + R* per corpus
# decade — the vector-index sibling of steps 11 and 13.
log "14/14 ivf staged crossover -> IVFSTAGED_r$r.json"
sbt -batch "Test/runMain graft.queries.IvfStagedProbe /root/repo/IVFSTAGED_r$r.json /tmp/graft_scale/sf0.1 /tmp/graft_scale/sf1 /tmp/graft_scale/sf3" \
  > /tmp/ivf_staged.log 2>&1 || { log "IVF STAGED PROBE FAILED"; fail=1; }
grep "\[ivfstaged\]" /tmp/ivf_staged.log >&2 || true

if [ "$fail" -ne 0 ]; then log "DONE WITH FAILURES"; exit 1; fi
log "done (all gates green)"
