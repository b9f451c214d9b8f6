#!/bin/bash
# Round-5 second wave: the base-2-logit softmax fold + q-tile sweep
# (built after the first-wave levers all lost), then the two
# measurement items VERDICT r4 asks for (#3 val pipeline, #5 scaled
# recurrence). START=<n> resumes.
set -x
cd "$(dirname "$0")/.."
OUT=bench_results/r5
mkdir -p "$OUT"
START=${START:-1}

step() { [ "$1" -ge "$START" ]; }

step 1 && PARQ_FOLD_LOG2E=1 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_fold_log2e.log"
step 2 && PARQ_EVAL_QTILE=128 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_qtile128.log"
step 3 && PARQ_FOLD_LOG2E=1 PARQ_EVAL_QTILE=128 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_fold_qtile.log"

# VERDICT r4 #3: pipelined validate() measured at val scale on chip
step 4 && timeout 3000 python scripts/bench_val_pipeline.py \
    --release --snippets 512 --scenes 16 2>&1 | tee "$OUT/val_pipeline.log"

# VERDICT r4 #5: scaled-recurrence re-measure on the r4/r5 kernels
step 5 && timeout 3000 python scripts/bench_scaled_recurrence.py \
                                           2>&1 | tee "$OUT/scaled_recurrence.log"

# train re-runs: the first-wave hash_v2 run died on an infra flake (the
# stacked run later executed the same kernel fine), and the winning
# stack must be measured WITHOUT the losing fpn_fused member
step 6 && PARQ_DROPOUT_HASH=v2 timeout 3000 python bench.py --train \
                                           2>&1 | tee "$OUT/train_hash_v2b.log"
step 7 && PARQ_DROPOUT_HASH=v2 PARQ_RNG_IMPL=rbg timeout 3000 \
    python bench.py --train                2>&1 | tee "$OUT/train_v2_rbg.log"
echo DONE
