#!/bin/bash
# Round-4 parity queue, part B: reordered remainder (cheapest families
# first so evidence banks before the round ends on the single-core host).
# Waits for the in-flight cifar10_hybrid run (started by run_parity_r4.sh,
# whose wrapper was stopped to allow this reorder), then runs
# svhn -> emotion -> cifar10_noconv -> tiny_imagenet(bn66 control), each in
# its own process with dual evaluation (reference semantics + bn-refresh 66
# control per training run).  Logs: perf/parity_mi_<family>.log
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for in-flight parity run (pid $WAIT_PID) $(date -u +%FT%TZ)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
for fam in svhn emotion cifar10_noconv tiny_imagenet; do
  echo "=== $fam start $(date -u +%FT%TZ) ==="
  nice -n 10 python tools/parity_run.py --match-init --bn-refresh 66 \
    --seeds 8 --families "$fam" --platform cpu \
    > "perf/parity_mi_${fam}.log" 2>&1
  echo "=== $fam done rc=$? $(date -u +%FT%TZ) ==="
done
echo "ALL DONE $(date -u +%FT%TZ)"
