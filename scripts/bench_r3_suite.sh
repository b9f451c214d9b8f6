#!/bin/bash
# On-chip validation suite for the mid-round-3 changes (fused K/V eval
# projection, fused detection heads, trace-identity rotation loss,
# channel-major rayPE, q/k fusion, 30-iter bench protocol).
# Run when the TPU tunnel is back: bash scripts/bench_r3_suite.sh
# Results land in /tmp/bench_r3/. Each step is independently resumable.
set -x
mkdir -p /tmp/bench_r3
cd "$(dirname "$0")/.."

# 1. eval headline (warms the driver's compile cache too)
timeout 3000 python bench.py               2>&1 | tee /tmp/bench_r3/eval_b8_bf16.log
# 2. train headline
timeout 3000 python bench.py --train       2>&1 | tee /tmp/bench_r3/train_b8_bf16.log
# 3. fused-heads layer-2 A/B on train
PARQ_FUSED_HEADS_L2=split timeout 3000 python bench.py --train \
                                           2>&1 | tee /tmp/bench_r3/train_l2split.log
# 4. parity latency setting
timeout 3000 python bench.py --batch 1 --dtype float32 \
                                           2>&1 | tee /tmp/bench_r3/eval_b1_f32.log
# 5. train decomposition for the tail bucketing
timeout 3000 python scripts/bench_train_parts.py \
                                           2>&1 | tee /tmp/bench_r3/train_parts.log
# 6. flat-optimizer A/B on train (TPU.FLAT_OPTIMIZER candidate)
timeout 3000 python bench.py --train --flat-opt \
                                           2>&1 | tee /tmp/bench_r3/train_flatopt.log
# 7. matmul-form FPN resize A/B on eval (concat layout-copy candidate)
PARQ_FPN_MM_RESIZE=1 timeout 3000 python bench.py \
                                           2>&1 | tee /tmp/bench_r3/eval_mmresize.log
# 8. fully-unrolled decoder scan A/B on eval (loop-overhead candidate)
PARQ_SCAN_UNROLL=8 timeout 3000 python bench.py \
                                           2>&1 | tee /tmp/bench_r3/eval_unroll.log
echo DONE
