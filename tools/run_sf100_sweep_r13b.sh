#!/bin/bash
# r13 sweep continuation: remaining entries with DUCK_TIMEOUT_S=1500
# (matches the r12 artifact's DNF bound for comparability).
set -u
cd /root/repo
ENTRIES=(
  dedup_minhash_components_replayable
  pipeline_clean_corpus_scalable_replayable
  semdedup_clustered
  similarity_topk
  similarity_ivf_fullprobe
  similarity_ivf_multiprobe_replayable
  dedup_minhash_components
  pipeline_clean_corpus_scalable
  similarity_ivf_topk
)
for e in "${ENTRIES[@]}"; do
  echo "=== $(date -u +%H:%M:%S) sweeping $e (load: $(cut -d' ' -f1-3 /proc/loadavg))"
  DUCK_TIMEOUT_S=1500 SPARK_DRIVER_MEMORY=64g timeout 5400 python tools/sf100_llmops.py /dev/shm/sf100 "$e" \
    >/tmp/sf100_r13_"$e".log 2>&1
  echo "    rc=$?"
  sleep 75
done
python tools/sf100_llmops.py merge /tmp/sf100_llmops.jsonl \
  "r13 regeneration: per-process, fresh 64g JVM per entry, 75s gaps, DUCK_TIMEOUT_S=1500; post all_pairs_cosine/simhash/minhash-plan changes; spans window co-tenant-throttled (both engines; see duck_trials)"
echo DONE
