#!/bin/bash
# Round-4 on-chip A/B suite: finishes the steps that never produced numbers
# in round 3 (VERDICT r3 Weak #2) and re-records the two headlines.
# Results land in bench_results/r4/ (committed — /tmp is volatile).
# Each step is independently resumable; skip steps whose .log already has a
# JSON line by passing START=<n>.
set -x
cd "$(dirname "$0")/.."
OUT=bench_results/r4
mkdir -p "$OUT"
START=${START:-1}

step() { [ "$1" -ge "$START" ]; }

# 1. eval headline (warms compile cache)
step 1 && timeout 3000 python bench.py               2>&1 | tee "$OUT/eval_b8_bf16.log"
# 2. train headline
step 2 && timeout 3000 python bench.py --train       2>&1 | tee "$OUT/train_b8_bf16.log"
# 3. fused-heads layer-2 A/B on train (possible ~1ms regression)
step 3 && PARQ_FUSED_HEADS_L2=split timeout 3000 python bench.py --train \
                                           2>&1 | tee "$OUT/train_l2split.log"
# 4. parity latency setting
step 4 && timeout 3000 python bench.py --batch 1 --dtype float32 \
                                           2>&1 | tee "$OUT/eval_b1_f32.log"
# 5. train decomposition for the tail bucketing
step 5 && timeout 3000 python scripts/bench_train_parts.py \
                                           2>&1 | tee "$OUT/train_parts.log"
# 6. flat-optimizer A/B on train (TPU.FLAT_OPTIMIZER candidate)
step 6 && timeout 3000 python bench.py --train --flat-opt \
                                           2>&1 | tee "$OUT/train_flatopt.log"
# 7. matmul-form FPN resize A/B on eval (concat layout-copy candidate)
step 7 && PARQ_FPN_MM_RESIZE=1 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_mmresize.log"
# 8. fully-unrolled decoder scan A/B on eval (loop-overhead candidate)
step 8 && PARQ_SCAN_UNROLL=8 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_unroll.log"
echo DONE
