#!/bin/bash
# Round-5 evidence chain. Crash-proof: every artifact is committed the
# moment its run finishes (round 4 lost 5 of 6 artifacts to a timeout),
# ordered most-important-first.
#
# RECORD: round 5 ran these steps interactively instead, committing each
# artifact as it landed (BENCH_512_GRAD_r05, BENCH_r05_preview,
# BENCH_GRAD_r05, ABLATION_r05, SCALING_r05 — see git log); this script
# remains the one-shot reproduction path.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/sweep_r05.log

run_commit() {
  # run_commit <artifact> <msg> <cmd...>: run, keep stdout in artifact
  # when it is a JSON-line producer, commit on success.
  local art=$1 msg=$2; shift 2
  echo "### $* -> $art" | tee -a $LOG
  if timeout 1800 "$@" >"$art".tmp 2>>$LOG; then
    mv "$art".tmp "$art"
    git add "$art" && git commit -q -m "$msg" || true
  else
    echo "FAILED: $*" | tee -a $LOG
    rm -f "$art".tmp
  fi
}

# 1. config-5 scale: 512^3 training step (the north-star claim)
run_commit BENCH_512_GRAD_r05.json "512^3 training benchmark artifact" \
  python bench.py --grad --grid 512 --iters 3

# 2. headline forward (step_batch=2 default now shipped)
run_commit BENCH_r05_preview.json "headline forward benchmark preview" \
  python bench.py --iters 5

# 3. flagship training benchmark
run_commit BENCH_GRAD_r05.json "flagship training benchmark artifact" \
  python bench.py --grad --iters 3

# 4. early-termination + step-batch ablation
echo "### ablation" | tee -a $LOG
if timeout 1800 python -m volumetric_renderer_tpu.apps.ablation \
    --out ABLATION_r05.json 2>>$LOG; then
  git add ABLATION_r05.json && git commit -q -m "round-5 ablation artifact" || true
fi

# 5. strong-scaling emulation
echo "### scaling" | tee -a $LOG
if timeout 1800 python -m volumetric_renderer_tpu.apps.scaling \
    --out SCALING_r05.json 2>>$LOG; then
  git add SCALING_r05.json && git commit -q -m "round-5 scaling artifact" || true
fi

echo "=== SWEEP R05 DONE ===" | tee -a $LOG
