#!/bin/bash
# Round-4 paired matched-init parity queue (VERDICT r3 items 1+2): all 7
# families, n=8 seeds, dual evaluation (reference semantics + bn-refresh 66
# control) from ONE training run per seed.  Cheapest families first so
# evidence banks early; one family per process so a crash loses one family,
# not the queue.  Logs: perf/parity_mi_<family>.log
set -u
cd "$(dirname "$0")/.."
for fam in mnist svhn emotion fashion_mnist cifar10_noconv cifar10_hybrid tiny_imagenet; do
  echo "=== $fam start $(date -u +%FT%TZ) ==="
  nice -n 10 python tools/parity_run.py --match-init --bn-refresh 66 \
    --seeds 8 --families "$fam" --platform cpu \
    > "perf/parity_mi_${fam}.log" 2>&1
  echo "=== $fam done rc=$? $(date -u +%FT%TZ) ==="
done
echo "ALL DONE $(date -u +%FT%TZ)"
