#!/bin/bash
# Round-5 TPU queue. Stage order = VERDICT r4 priority: hybrid-run eval,
# meshbank accuracy gap (HPO -> retrain -> diagnosis -> full-bank 1024),
# solver debias evidence, max_ssw dual-error sweep + final, HPO at depth,
# throughput rows (fixed methodology), trace residual.
# Each stage under `timeout` so nothing can stall the queue.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }

# wait for the flagship hybrid training to release the chip
while pgrep -f "train_bench.py w_cos 2000" > /dev/null; do sleep 60; done
log "chip free"

log "A0: reconstruct hybrid row if the run was killed before writing it"
python - <<'EOF'
import json, subprocess, os
rows = json.load(open('benchmarks/registration_tpu.json'))
if not any(r['criterion'] == 'w_cos_128_hybrid' for r in rows):
    subprocess.run(['python', 'benchmarks/reconstruct_row.py',
                    'bench_w_cos_128_hybrid', 'w_cos_128_hybrid',
                    '128', 'hybrid'])
EOF

log "A: held-out eval curves for the hybrid-trained flagship"
timeout 900 python -u benchmarks/eval_checkpoint.py bench_w_cos_128_hybrid

log "B: meshbank HPO (lr/wd/lambda, 12 x 100-epoch w_cos trials)"
timeout 2400 python -u benchmarks/meshbank_hpo.py 12 100 128

log "C: meshbank N=128 retrain at the HPO winner (3000 epochs)"
BEST=$(python - <<'EOF'
import json, os
p = 'benchmarks/meshbank_hpo.json'
if os.path.exists(p):
    d = json.load(open(p))
    b = d['best_params']
    print(b['adam_lr'], b['adam_weight_decay'], b['shwd_lambda'])
else:
    print('1e-3 1.4096013153858628e-08 1.3111961119405346e-05')
EOF
)
read -r LR WD LAM <<< "$BEST"
echo "meshbank retrain with lr=$LR wd=$WD lam=$LAM"
timeout 3000 python -u benchmarks/meshbank_bench.py 128 3000 sinkhorn "$LR" 1234 "$WD" "$LAM"

log "D: meshbank per-family + symmetry-ambiguity diagnosis"
timeout 900 python -u benchmarks/meshbank_diagnosis.py meshbank_w_cos_128 16

log "E: solver parity at N=1024 incl. debiased sinkhorn divergence"
timeout 1500 python -u benchmarks/solver_parity_1024.py

log "F: max_ssw batch-4 probes (dual-error acceptance, 80 epochs)"
timeout 3000 python -u benchmarks/probe_max_ssw.py 80 M_mlp_lr3e-5_L512 O_mlp_frozen_L512 P_mlp_lr9e-5_L512_p1 Q_mlp_lr9e-5_L512_mb32 J_mlp_lr9e-5_L512

log "G: final max_ssw run on the combined-score winner (700 epochs)"
timeout 2700 python -u benchmarks/final_max_ssw.py 700
if [ -f benchmarks/.max_ssw_improved ]; then
  log "G-eval: held-out curves for the improved max_ssw checkpoint"
  timeout 900 python -u benchmarks/eval_checkpoint.py bench_max_ssw
fi

log "H: HPO at reference depth (25 trials x 150 epochs, post-replay-fix)"
timeout 3000 python -u benchmarks/hpo_smoke.py 25 150 hpo_study_150ep

log "I: meshbank N=1024 on the FULL 640-mesh bank (ssw solver)"
timeout 3600 python -u benchmarks/meshbank_bench.py 1024 2000 ssw

log "J: throughput rows (persistent-phase auction; marginal methodology)"
timeout 2500 python -u benchmarks/throughput_1chip.py hybrid_flagship hybrid_1024

log "K: op-level trace residual (ssw_light + hybrid_flagship)"
timeout 1800 python -u benchmarks/trace_residual.py

log "all r5 stages done"
