#!/bin/bash
# Round-4 capstone: re-run OUR side of the paired matched-init parity
# protocol on the REAL TPU chip (platform axon), reusing the banked torch
# reference accuracies (perf/parity.jsonl, keyed by (family, bn_refresh);
# torch seed-s inits are deterministic so the per-seed pairing stays valid).
# This measures accuracy parity on the target hardware — TPU numerics
# (bf16 MXU passes under DEFAULT precision, different reduction orders)
# instead of the CPU f32 numerics every prior table used.
# Families cheapest-compile-first so evidence banks incrementally.
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for in-flight parity run (pid $WAIT_PID) $(date -u +%FT%TZ)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
for fam in ${FAMS:-svhn emotion fashion_mnist cifar10_noconv cifar10_hybrid}; do
  echo "=== $fam start $(date -u +%FT%TZ) ==="
  timeout 1200 python tools/parity_run.py --match-init --bn-refresh 66 \
    --seeds 8 --families "$fam" --ref-accs-from perf/parity.jsonl \
    > "perf/parity_tpu_${fam}.log" 2>&1
  echo "=== $fam done rc=$? $(date -u +%FT%TZ) ==="
done
echo "ALL DONE $(date -u +%FT%TZ)"
