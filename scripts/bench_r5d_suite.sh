#!/bin/bash
# Round-5 fourth wave, built from the r5 eval profile
# (bench_results/r5/eval_profile_957.log): heads layer-2 k-batched
# dot_general (XLA rewrites the block-diag matmul into a 1x2-window conv
# at ~8x off roofline), sampler row-tile sweep. START=<n> resumes.
set -x
cd "$(dirname "$0")/.."
OUT=bench_results/r5
mkdir -p "$OUT"
START=${START:-1}

step() { [ "$1" -ge "$START" ]; }

step 1 && PARQ_HEADS_L2=batched timeout 3000 python bench.py \
                                        2>&1 | tee "$OUT/eval_heads_batched.log"
step 2 && PARQ_SAMPLER_RT=30 timeout 3000 python bench.py \
                                        2>&1 | tee "$OUT/eval_sampler_rt30.log"
step 3 && PARQ_SAMPLER_RT=10 timeout 3000 python bench.py \
                                        2>&1 | tee "$OUT/eval_sampler_rt10.log"
# stacked winners (edit flags per results)
step 4 && PARQ_HEADS_L2=batched PARQ_SAMPLER_RT=30 timeout 3000 \
    python bench.py                     2>&1 | tee "$OUT/eval_stack4.log"
# train side of the heads-L2 form (r4 only A/B'd the SPLIT form)
step 5 && PARQ_HEADS_L2=batched timeout 3000 python bench.py --train \
                                        2>&1 | tee "$OUT/train_heads_batched.log"
echo DONE
