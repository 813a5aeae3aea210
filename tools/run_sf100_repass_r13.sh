#!/bin/bash
# r13 sf100 second pass: re-run the entries whose first-pass windows were
# throttle-contaminated (both engines inflated together). Each entry
# waits for 1-min loadavg < 1.5 (max 12 min) before starting; appends to
# the shared JSONL; merge happens at the end (per-entry adjudication of
# which window to keep is done before the final merge).
set -u
cd /root/repo
ENTRIES=(
  semdedup_clustered
  similarity_topk
  similarity_ivf_fullprobe
  similarity_ivf_multiprobe_replayable
  dedup_substring_spans
)
settle() {
  for _ in $(seq 1 72); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l<1.5)}' && return 0
    sleep 10
  done
  return 1
}
for e in "${ENTRIES[@]}"; do
  settle; s=$?
  echo "=== $(date -u +%H:%M:%S) repass $e (settled=$s load: $(cut -d' ' -f1-3 /proc/loadavg))"
  DUCK_TIMEOUT_S=1500 SPARK_DRIVER_MEMORY=64g timeout 5400 python tools/sf100_llmops.py /dev/shm/sf100 "$e" \
    >/tmp/sf100_r13_repass_"$e".log 2>&1
  echo "    rc=$?"
done
echo REPASS_DONE
