#!/bin/bash
# Round-4 paired matched-init parity queue (VERDICT r3 items 1+2): remaining
# families at n=8 seeds with dual evaluation (reference semantics + bn-refresh
# 66 control) from ONE training run per seed.  mnist already banked
# 2026-08-20 (incl. its bn66 no-op control — the mnist reference model has no
# BatchNorm, so identical rows are the expected null).  Cheapest families
# first so evidence banks early; one family per process so a crash loses one
# family, not the queue.  Logs: perf/parity_mi_<family>.log
set -u
cd "$(dirname "$0")/.."
# Order = evidence value per VERDICT r3: the fashion bn66 control first (it
# converts the weakest paired row into the tight-equivalence demonstration),
# then hybrid n=6->8, then the three never-paired families, then tiny's
# control (its paired reference-semantics row is already banked).
for fam in fashion_mnist cifar10_hybrid svhn cifar10_noconv emotion tiny_imagenet; do
  echo "=== $fam start $(date -u +%FT%TZ) ==="
  nice -n 10 python tools/parity_run.py --match-init --bn-refresh 66 \
    --seeds 8 --families "$fam" --platform cpu \
    > "perf/parity_mi_${fam}.log" 2>&1
  echo "=== $fam done rc=$? $(date -u +%FT%TZ) ==="
done
echo "ALL DONE $(date -u +%FT%TZ)"
