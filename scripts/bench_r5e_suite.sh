#!/bin/bash
# Round-5 fifth wave: static-shift softmax A/B, train-side sampler tile,
# then the official end-of-round headline passes. START=<n> resumes.
set -x
cd "$(dirname "$0")/.."
OUT=bench_results/r5
mkdir -p "$OUT"
START=${START:-1}

step() { [ "$1" -ge "$START" ]; }

# static-max lever on top of the current winners (rt30 default-pending)
step 1 && PARQ_ATTN_STATICMAX=80 PARQ_SAMPLER_RT=30 timeout 3000 \
    python bench.py 2>&1 | tee "$OUT/eval_staticmax.log"

# train side of the sampler tile (phase-1 trajectory runs the fwd kernel)
step 2 && PARQ_SAMPLER_RT=30 timeout 3000 python bench.py --train \
    2>&1 | tee "$OUT/train_sampler_rt30.log"

# official end-of-round headlines at the promoted defaults
step 3 && timeout 3000 python bench.py 2>&1 | tee "$OUT/eval_final.log"
step 4 && timeout 3000 python bench.py --train 2>&1 | tee "$OUT/train_final.log"
step 5 && timeout 3000 python bench.py --batch 1 --dtype float32 \
    2>&1 | tee "$OUT/eval_b1_f32_final.log"
echo DONE
