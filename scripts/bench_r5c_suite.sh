#!/bin/bash
# Round-5 third wave: stack the wave-1/2 winners with the split-add FPN
# tail (PARQ_FPN_SPLITADD — the pure-XLA replacement for the deleted
# Pallas fused tail). START=<n> resumes.
set -x
cd "$(dirname "$0")/.."
OUT=bench_results/r5
mkdir -p "$OUT"
START=${START:-1}

step() { [ "$1" -ge "$START" ]; }

# eval: fold (won +9.9) + split-add
step 1 && PARQ_FOLD_LOG2E=1 PARQ_FPN_SPLITADD=1 timeout 3000 \
    python bench.py 2>&1 | tee "$OUT/eval_fold_splitadd.log"
# split-add alone (attribution: how much of the stack is the tail fold)
step 2 && PARQ_FPN_SPLITADD=1 timeout 3000 \
    python bench.py 2>&1 | tee "$OUT/eval_splitadd.log"

# train: rbg (won +8.0) + split-add; hash v2 folded in if its wave-2
# re-run is clean
step 3 && PARQ_RNG_IMPL=rbg PARQ_FPN_SPLITADD=1 timeout 3000 \
    python bench.py --train 2>&1 | tee "$OUT/train_rbg_splitadd.log"
step 4 && PARQ_DROPOUT_HASH=v2 PARQ_RNG_IMPL=rbg PARQ_FPN_SPLITADD=1 \
    timeout 3000 python bench.py --train \
    2>&1 | tee "$OUT/train_v2_rbg_splitadd.log"
echo DONE
