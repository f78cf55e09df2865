#!/bin/bash
# Backward cost decomposition on hardware (VERDICT r04 #4): time the
# flagship training step with individual bwd matmul groups dropped to
# cheaper MXU precisions, and with thicker backward slabs.  Each line of
# /tmp/bwd_cost_sweep.log is one measured config.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bwd_cost_sweep.log}
: > "$LOG"

run() {
  local tag=$1; shift
  echo "### $tag" | tee -a "$LOG"
  timeout 1500 env "$@" python bench.py --grad --iters 3 2>/dev/null \
    | tee -a "$LOG"
}

run baseline_high
run density_x3   VRT_BWD_DENSITY_PREC=x3
run fetch_x3     VRT_BWD_FETCH_PREC=x3
run dens_fetch_x3 VRT_BWD_DENSITY_PREC=x3 VRT_BWD_FETCH_PREC=x3
run dwtf_fast    VRT_BWD_DWTF_PREC=fast
run tfg_scatter_fast VRT_BWD_TFG_PREC=fast VRT_BWD_SCATTER_PREC=fast
run thick_9mb    VRT_BWD_VMEM_MB=9
run thick_18mb   VRT_BWD_VMEM_MB=18

echo "=== BWD COST SWEEP DONE ===" | tee -a "$LOG"
