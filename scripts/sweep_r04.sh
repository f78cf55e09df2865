#!/bin/bash
# Round-4 evidence sweeps on the real chip, serialized.
# Writes raw JSON lines to /tmp/sweep_r04.log for artifact assembly.
set -u
LOG=/tmp/sweep_r04.log
: > $LOG
run() {
  echo "### $*" | tee -a $LOG
  timeout 900 "$@" 2>>$LOG | tee -a $LOG
}

# 1. forward step-batch sweep, fast mode (batch 8 missing from first pass)
VRT_STEP_BATCH=8 run python bench.py --no-baseline --iters 5

# 2. forward step-batch sweep, exact mode
for b in 1 2 4; do
  VRT_STEP_BATCH=$b run python bench.py --no-baseline --iters 5 --slab-mode exact
done

# 3. grad: bwd step-batch sweep at flagship (fwd batch pinned at 2)
for b in 1 2 4 8; do
  VRT_STEP_BATCH=2 VRT_BWD_STEP_BATCH=$b run python bench.py --grad --iters 3
done

# 4. config-5 scale: 512^3 grad (the BENCH_512_GRAD_r04 evidence)
VRT_STEP_BATCH=2 VRT_BWD_STEP_BATCH=2 run python bench.py --grad --grid 512 --iters 3

# 5. 512^3 forward, batch 1 vs 2
for b in 1 2; do
  VRT_STEP_BATCH=$b run python bench.py --no-baseline --grid 512 --iters 5
done

echo "=== SWEEP DONE ===" | tee -a $LOG
