#!/bin/bash
# Re-run OUR side of the paired matched-init parity protocol on the REAL TPU
# chip (platform axon), reusing the banked torch reference accuracies
# (perf/parity.jsonl — only torch-trained provenance rows qualify; rows
# produced via --ref-accs-from are skipped by parity_run.py).  This measures
# accuracy parity on the target hardware — TPU numerics (bf16 MXU passes
# under DEFAULT precision, different reduction orders) instead of the CPU
# f32 numerics every prior table used.
#
# Robustness (ADVICE r4 / VERDICT r4 #2):
#  * flock on a lockfile — two overlapping queue instances can no longer
#    interleave on the single chip or double-bank rows;
#  * per-family timeout configurable via PARITY_TIMEOUT (default 1200 s);
#  * parity_run.py banks every finished seed incrementally
#    (perf/parity_seeds.jsonl) and reruns skip banked seeds, so a timeout
#    preserves partial evidence and the queue converges over reruns;
#  * logs APPEND (timestamped banner per attempt) instead of truncating.
set -u
cd "$(dirname "$0")/.."
exec 9>perf/.parity_tpu.lock
if ! flock -n 9; then
  echo "another parity queue holds perf/.parity_tpu.lock; refusing to overlap" >&2
  exit 1
fi
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for in-flight parity run (pid $WAIT_PID) $(date -u +%FT%TZ)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
TIMEOUT="${PARITY_TIMEOUT:-1200}"
for fam in ${FAMS:-svhn emotion fashion_mnist cifar10_noconv cifar10_hybrid}; do
  echo "=== $fam start $(date -u +%FT%TZ) timeout=${TIMEOUT}s ==="
  {
    echo "=== attempt $(date -u +%FT%TZ) git=$(git rev-parse --short HEAD) ==="
    timeout "$TIMEOUT" python tools/parity_run.py --match-init --bn-refresh 66 \
      --seeds "${SEEDS:-8}" --families "$fam" --ref-accs-from perf/parity.jsonl
    echo "=== attempt rc=$? $(date -u +%FT%TZ) ==="
  } >> "perf/parity_tpu_${fam}.log" 2>&1
  echo "=== $fam done $(date -u +%FT%TZ) ==="
done
echo "ALL DONE $(date -u +%FT%TZ)"
