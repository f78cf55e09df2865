#!/bin/bash
# Round-4 evidence chain, stage 2 (after the bwd batch Mosaic fix).
set -u
LOG=/tmp/sweep_r04b.log
: > $LOG
run() {
  echo "### $*" | tee -a $LOG
  timeout 1200 "$@" 2>>$LOG | tee -a $LOG
}

# 0. hardware numeric parity: bwd batch 2/4 vs batch 1 on the chip
run python scripts/check_bwd_batch_parity.py

# 1. grad: bwd step-batch sweep at flagship (fwd batch pinned at 2)
for b in 2 4; do
  VRT_STEP_BATCH=2 VRT_BWD_STEP_BATCH=$b run python bench.py --grad --iters 3
done

# 2. config-5 scale: 512^3 grad with best-known settings (bwd batch from
#    the flagship sweep is read manually; run both 1 and 2 to be safe)
for b in 1 2; do
  VRT_STEP_BATCH=2 VRT_BWD_STEP_BATCH=$b run python bench.py --grad --grid 512 --iters 3
done

# 3. early-termination ablation (in-slab exit now live)
run python -m volumetric_renderer_tpu.apps.ablation --out ABLATION_r04.json

# 4. strong-scaling emulation incl. tile-shuffle + dispatch-floor validation
VRT_STEP_BATCH=2 run python -m volumetric_renderer_tpu.apps.scaling --out SCALING_r04.json

echo "=== SWEEP B DONE ===" | tee -a $LOG
