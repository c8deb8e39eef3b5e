#!/bin/bash
# Scale-curve probes for the heavy dedup family: fresh-JVM isolation laps
# at 1x / 3x / 10x the sf0.1 documents corpus (mosaic growth, see
# ScaleCorpus.scala), merged into SCALE_r{N}.json with fitted
# time-vs-rows exponents by scripts/merge_scale.py.
#
# Usage: scripts/scale_probes.sh OUT.json [query ...]
#   (default queries: dd_substring dd_minhash dd_clusters dd_winnow
#    dd_decontaminate)
set -u
out=$1; shift
queries=${@:-"dd_substring dd_minhash dd_clusters dd_winnow dd_decontaminate"}
base=/tmp/graft_scale
echo "[scale] staging corpora under $base ..." >&2
sbt -batch "Test/runMain graft.queries.ScaleCorpus $base" \
  > /tmp/scale_corpus.log 2>&1 || { echo "corpus staging FAILED"; exit 2; }
grep '\[scalecorpus\]' /tmp/scale_corpus.log >&2
tmp=/tmp/scale_probes_lines.jsonl
: > "$tmp"
for sf in sf0.1 sf0.3 sf1; do
  for q in $queries; do
    echo "[scale] $sf $q ..." >&2
    line=$(GRAFT_BENCH_ISOLATE="$q" GRAFT_BENCH_LAPS=3 \
      SPARK_GRAFT_SF_DIR="$base/$sf" \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"isolate".*')
    if [ -z "$line" ]; then
      echo "[scale] $sf $q produced no JSON" >&2
      line='{"isolate":"'$q'","sf":"'$base/$sf'","error":"no output"}'
    fi
    printf '%s\n' "$line" >> "$tmp"
  done
done
python3 scripts/merge_scale.py "$tmp" > "$out"
echo "[scale] wrote $out" >&2
