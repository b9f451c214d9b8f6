#!/bin/bash
# Round-4 on-chip suite. The four A/B lever steps it originally carried
# (fused-heads L2 split, flat-opt, FPN mm-resize, scan unroll) RAN on
# 2026-08-19 and ALL LOST — results in bench_results/r4/*.log and the
# decision record bench_results/r4/RESULTS.md; the losing levers were
# deleted per the dead-end policy. What remains is the headline suite.
# Each step is independently resumable: START=<n> skips steps < n.
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
# 3. parity latency setting
step 3 && timeout 3000 python bench.py --batch 1 --dtype float32 \
                                           2>&1 | tee "$OUT/eval_b1_f32.log"
# 4. train decomposition for the tail bucketing
step 4 && timeout 3000 python scripts/bench_train_parts.py \
                                           2>&1 | tee "$OUT/train_parts.log"
echo DONE
