#!/bin/bash
# Round-5 on-chip A/B suite, in priority order (VERDICT r4 asks #1/#2):
# eval levers (fused FPN tail, eval block_k sweep, partial scan unroll),
# train levers (fused tail, dropout-hash v2, RBG dropout RNG, dropout=0
# diagnostic). Each step is independently resumable: START=<n> skips
# steps < n. Record decisions in bench_results/r5/RESULTS.md; delete
# losing levers per the dead-end policy.
set -x
cd "$(dirname "$0")/.."
OUT=bench_results/r5
mkdir -p "$OUT"
START=${START:-1}

step() { [ "$1" -ge "$START" ]; }

# -- baselines (warm the compile cache, r4 code paths) ------------------
step 1 && timeout 3000 python bench.py               2>&1 | tee "$OUT/eval_base.log"
step 2 && timeout 3000 python bench.py --train       2>&1 | tee "$OUT/train_base.log"

# -- eval levers --------------------------------------------------------
step 3 && PARQ_FPN_FUSED=1 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_fpn_fused.log"
step 4 && PARQ_EVAL_BLOCK_K=2880 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_bk2880.log"
step 5 && PARQ_EVAL_BLOCK_K=7200 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_bk7200.log"
step 6 && PARQ_SCAN_UNROLL=2 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_unroll2.log"
step 7 && PARQ_SCAN_UNROLL=4 timeout 3000 python bench.py \
                                           2>&1 | tee "$OUT/eval_unroll4.log"

# -- train levers -------------------------------------------------------
step 8 && PARQ_FPN_FUSED=1 timeout 3000 python bench.py --train \
                                           2>&1 | tee "$OUT/train_fpn_fused.log"
step 9 && PARQ_DROPOUT_HASH=v2 timeout 3000 python bench.py --train \
                                           2>&1 | tee "$OUT/train_hash_v2.log"
step 10 && PARQ_RNG_IMPL=rbg timeout 3000 python bench.py --train \
                                           2>&1 | tee "$OUT/train_rbg.log"
# diagnostic: dropout=0 isolates the total in-kernel hash + mask cost
step 11 && timeout 3000 python bench.py --train --dropout 0.0 \
                                           2>&1 | tee "$OUT/train_dropout0.log"

# -- stacked winners + headline re-measures (edit flags per results) ----
step 12 && PARQ_FPN_FUSED=1 PARQ_DROPOUT_HASH=v2 PARQ_RNG_IMPL=rbg \
    timeout 3000 python bench.py --train 2>&1 | tee "$OUT/train_stacked.log"
step 13 && timeout 3000 python bench.py --batch 1 --dtype float32 \
                                           2>&1 | tee "$OUT/eval_b1_f32.log"
echo DONE
