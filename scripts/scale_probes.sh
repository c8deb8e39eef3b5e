#!/bin/bash
# Scale-curve probes: fresh-JVM isolation laps at 1x / 3x / 10x the sf0.1
# corpus (mosaic document growth + Gaussian embedding growth, see
# ScaleCorpus.scala), merged into SCALE_r{N}.json with fitted
# time-vs-rows exponents by scripts/merge_scale.py. dd_substring gets an
# extra 30x point (its marginal slope is the doc family's steepest — the
# far point separates flattening from compounding).
#
# Usage: scripts/scale_probes.sh OUT.json [query ...]
#   (default queries: the heavy dedup family + the embedding family)
set -u
out=$1; shift
queries=${@:-"dd_substring dd_substring_cut dd_dup_stats dd_minhash dd_clusters dd_winnow dd_decontaminate dd_decontaminate_fuzzy dd_embed_bucketed dd_embed_hi dd_embed_hi768 dd_embed_auto dd_delta dd_delta_embed dd_lines ann_lsh ann_ivf ann_ivf_pq ann_filtered ann_filtered_rare ann_filtered_auto ann_filtered_range mm_phash dd_delta_chain dd_delta_embed_chain ann_ivf_append dd_keep_best pipeline_clean_corpus"}
base=/tmp/graft_scale
echo "[scale] staging corpora under $base ..." >&2
sbt -batch "Test/runMain graft.queries.ScaleCorpus $base" \
  > /tmp/scale_corpus.log 2>&1 || { echo "corpus staging FAILED"; exit 2; }
grep '\[scalecorpus\]' /tmp/scale_corpus.log >&2
tmp=/tmp/scale_probes_lines.jsonl
: > "$tmp"
run_point() {
  local sf=$1 q=$2 laps=${3:-3}
  echo "[scale] $sf $q (laps=$laps) ..." >&2
  local line
  line=$(GRAFT_BENCH_ISOLATE="$q" GRAFT_BENCH_LAPS="$laps" \
    SPARK_GRAFT_SF_DIR="$base/$sf" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"isolate".*')
  if [ -z "$line" ]; then
    echo "[scale] $sf $q produced no JSON" >&2
    line='{"isolate":"'$q'","sf":"'$base/$sf'","error":"no output"}'
  fi
  printf '%s\n' "$line" >> "$tmp"
}
for sf in sf0.1 sf0.3 sf1; do
  for q in $queries; do
    run_point "$sf" "$q"
  done
done
# Far points: dd_substring's marginal-slope watch item gets 30x AND 100x
# (verdict r10 #5 — the next decade); dd_embed_hi gets 30x so the
# production-threshold claim is tested where superlinearity would show;
# dd_embed_hi768 gets 30x — the round-12 production-dimension done-bar
# (marginals < 1 through 30x at 768-d); dd_decontaminate_fuzzy gets 30x
# (verdict r11 #6: marginals rising 0.49→0.77 through 10x — the watch
# point that says whether the shared df cap needs tightening).
# dd_embed_hi768 ALSO gets 100x: the r11 64-d curve failed exactly one
# decade past its done-bar (marginal 2.31 at 100x), so the production-
# dimension claim is measured through the same decade that broke it.
run_point sf3 dd_substring
run_point sf10 dd_substring
run_point sf3 dd_embed_hi
run_point sf3 dd_embed_hi768
run_point sf10 dd_embed_hi768
run_point sf3 dd_decontaminate_fuzzy
# 100x for the fuzzy family (round 14): the sketch cut fixed the 30x
# verification wall; the remaining ~N^2 term is the raw band-bucket
# candidate join (16 B rows) — the far point says when THAT becomes the
# next wall.
run_point sf10 dd_decontaminate_fuzzy
# dd_substring_cut through the decade that measured 1.45 on the pair
# form: the per-doc cut form's whole claim is linearity where pair-list
# output compounds, so its curve runs the same far points.
run_point sf3 dd_substring_cut
# (sf10 dd_substring_cut runs below with the 6-lap protocol)
# 300x (round 15, verdict r14 #3/#4): the fuzzy 30->100x marginal was
# 0.841 AND RISING, and dd_substring_cut's was 1.297 — both watch items
# get their next decade measured instead of argued. sf30 is a
# documents-only staging (~1.5M docs).
# 6-lap warm protocol at the 300x points (round 17, VERDICT r16 #3):
# the r16 dd_substring_cut 100->300x marginal read 1.008 vs r15's 0.912
# on unchanged code — wobble around 1.0 that 3 laps cannot settle. The
# fuzzy curve's r16 recapture showed 6 laps converge where 3 spread
# ±10%; the far points that feed the pre-committed decision rule
# (substringCut scaladoc) get the settled protocol.
run_point sf30 dd_decontaminate_fuzzy 6
run_point sf30 dd_substring_cut 6
run_point sf10 dd_substring_cut 6
# dd_keep_best + pipeline_clean_corpus through 30x/100x (round 16,
# verdict r15 #5): the flagship gained component closure + keep-best
# argmax attach in round 15 but its curve stopped at 10x — the new
# policy's attach joins meet the same far-decade evidence bar as the
# families they compose.
run_point sf3 dd_keep_best
run_point sf10 dd_keep_best
run_point sf3 pipeline_clean_corpus
run_point sf10 pipeline_clean_corpus
python3 scripts/merge_scale.py "$tmp" > "$out"
echo "[scale] wrote $out" >&2
