#!/bin/bash
# Round-4 queue v3: the tail of run_queue_r4b.sh (stages N/M/P never ran —
# the round clock killed the queue mid-D3). Probe histories under log/ were
# lost with the workspace reset, so final_max_ssw.py now falls back to the
# recorded batch-3 winner. Budgets trimmed to fit the remaining wall clock.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }

log "P: final max_ssw run (batch-3 winner J: mlp L=512 lr9.2e-5, 280 epochs)"
timeout 1700 python -u benchmarks/final_max_ssw.py 280

if [ -f benchmarks/.max_ssw_improved ]; then
  log "P-eval: held-out curves for the improved max_ssw checkpoint"
  timeout 600 python -u benchmarks/eval_checkpoint.py bench_max_ssw
fi

log "N: solver parity at N=1024 (exact hybrid oracle vs sinkhorn/ssw)"
timeout 1000 python -u benchmarks/solver_parity_1024.py

log "M: discriminative HPO study (8 trials x 80 epochs)"
timeout 1500 python -u benchmarks/hpo_smoke.py 8 80 hpo_study_80ep

log "Z: rerun hybrid_1024 throughput row (fix the negative dispatch intercept)"
timeout 700 python -u benchmarks/throughput_1chip.py hybrid_1024

log "all r4c stages done"
