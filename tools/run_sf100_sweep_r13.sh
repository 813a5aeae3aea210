#!/bin/bash
# r13 sf100 re-sweep (VERDICT r12 next-round #4): one entry per process
# (fresh 64g JVM each, gateway terminated before the DuckDB phase), 75 s
# settle gaps, JSONL appended to /tmp/sf100_llmops.jsonl, merged into the
# repo artifact at the end. Mirrors the r12 per-process protocol.
set -u
cd /root/repo
ENTRIES=(
  dedup_substring_spans
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
  SPARK_DRIVER_MEMORY=64g timeout 5400 python tools/sf100_llmops.py /dev/shm/sf100 "$e" \
    >/tmp/sf100_r13_"$e".log 2>&1
  echo "    rc=$?"
  sleep 75
done
python tools/sf100_llmops.py merge /tmp/sf100_llmops.jsonl \
  "r13 regeneration: per-process, fresh 64g JVM per entry, 75s gaps; post all_pairs_cosine/simhash/minhash-plan changes"
echo DONE
