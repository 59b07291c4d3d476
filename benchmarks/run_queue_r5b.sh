#!/bin/bash
# Round-5 queue, revision B. The original stage-B HPO (12 x 100-epoch
# trials) was killed after 3 trials: ALL meshbank trials read ~148 deg
# because the r4 curve has a ~157-deg anti-aligned plateau that only breaks
# after ~6k optimizer steps — at 4 steps/epoch (520 meshes, batch 128) no
# 100-epoch trial can discriminate anything. The real variable is STEP
# COUNT: batch 32 reaches the same step budget 4x earlier and matches the
# reference's per-epoch step count (ModelNet10: 3991 meshes / 128 = 31
# steps/epoch). Stages B/C probe exactly that, then the remaining r5
# stages run unchanged.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }

log "B1: meshbank escape probe - batch 32, lr 1e-3, 500 epochs"
timeout 900 python -u benchmarks/meshbank_bench.py 128 500 sinkhorn 1e-3 1234 1.4096013153858628e-08 1.3111961119405346e-05 32 _b32probe

log "B2: meshbank escape probe - batch 32, lr 3e-3, 500 epochs"
timeout 900 python -u benchmarks/meshbank_bench.py 128 500 sinkhorn 3e-3 1234 1.4096013153858628e-08 1.3111961119405346e-05 32 _b32lr3probe

log "B3: meshbank escape probe - batch 128, lr 3e-3, 500 epochs"
timeout 900 python -u benchmarks/meshbank_bench.py 128 500 sinkhorn 3e-3 1234 1.4096013153858628e-08 1.3111961119405346e-05 128 _lr3probe

log "C: meshbank N=128 final at the best probe (picked from committed rows)"
WIN=$(python - <<'EOF'
import json
rows = json.load(open('benchmarks/registration_tpu.json'))
best, cfg = 1e9, ("32", "1e-3")
for r in rows:
    c = r.get("criterion", "")
    if c.startswith("w_cos_meshbank_128_") and c.endswith("probe"):
        if r["best_rot_error"] < best:
            best = r["best_rot_error"]
            cfg = (str(r.get("batch", 32)), str(r.get("lr", 1e-3)))
print(cfg[0], cfg[1])
EOF
)
read -r WB WLR <<< "$WIN"
echo "meshbank final with batch=$WB lr=$WLR"
timeout 2700 python -u benchmarks/meshbank_bench.py 128 2500 sinkhorn "$WLR" 1234 1.4096013153858628e-08 1.3111961119405346e-05 "$WB"

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

log "J: throughput rows (warm-restart hybrid; marginal methodology)"
timeout 2500 python -u benchmarks/throughput_1chip.py hybrid_flagship hybrid_1024

log "K: op-level trace residual (ssw_light + hybrid_flagship)"
timeout 1800 python -u benchmarks/trace_residual.py

log "all r5b stages done"
