#!/bin/bash
# Round-4 queue v2: restructured after the fused-eval trainer landed
# (per-epoch wall time ~halved) and the chiral mesh bank replaced the
# first-cut bumpy spheres. Serial TPU jobs, one timeout per stage.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }

log "O: reconstruct + eval the N=1024 registration run (stage-B timeout kill)"
timeout 300 python -u benchmarks/reconstruct_row.py bench_w_cos_1024_ssw w_cos_1024_ssw 1024 ssw
timeout 1500 python -u benchmarks/eval_checkpoint.py bench_w_cos_1024_ssw

log "C2: meshbank production chain N=128 (chiral bank, 2000 epochs)"
timeout 2700 python -u benchmarks/meshbank_bench.py 128 2000

log "D2: meshbank production chain N=1024 (chiral bank, ssw, 2000 epochs)"
timeout 3600 python -u benchmarks/meshbank_bench.py 1024 2000 ssw

log "F: sinkhorn retrain 300"
timeout 2400 python -u benchmarks/train_bench.py sinkhorn 300

log "G: w1_cos retrain 200"
timeout 2700 python -u benchmarks/train_bench.py w1_cos 200

log "H: pseudo_w_cos retrain 150"
timeout 2700 python -u benchmarks/train_bench.py pseudo_w_cos 150

log "I: held-out eval curves for the four criteria"
for exp in bench_cd bench_sinkhorn bench_w1_cos bench_pseudo_w_cos; do
  timeout 900 python -u benchmarks/eval_checkpoint.py "$exp"
done

log "J: max_ssw batch-3 probes (60 epochs)"
timeout 2400 python -u benchmarks/probe_max_ssw.py 60 J_mlp_lr9e-5_L512 K_enc_lr9e-5_it1 L_mlp_lr3e-4_L256 E_old_lr9e-5_it1

log "K: flagship w_cos to the canonical 2000 epochs"
timeout 7200 python -u benchmarks/train_bench.py w_cos 2000

log "L: flagship held-out eval"
timeout 900 python -u benchmarks/eval_checkpoint.py bench_w_cos

log "C3: meshbank 640-mesh bank N=128 (canonical batch-128 regime, 2000 epochs)"
rm -rf meshbank_cache
timeout 2700 python -u benchmarks/meshbank_bench.py 128 2000

log "D3: meshbank 640-mesh bank N=1024 (ssw, 2000 epochs)"
timeout 3600 python -u benchmarks/meshbank_bench.py 1024 2000 ssw

log "N: solver parity at N=1024"
timeout 2400 python -u benchmarks/solver_parity_1024.py

log "M: discriminative HPO study (80-epoch trials)"
timeout 3600 python -u benchmarks/hpo_smoke.py 8 80 hpo_study_80ep

log "P: final max_ssw run (probe winner, 400 epochs) + eval"
timeout 4500 python -u benchmarks/final_max_ssw.py 400
timeout 900 python -u benchmarks/eval_checkpoint.py bench_max_ssw
log "all r4 stages done"
