#!/bin/bash
# Meshbank ladder 2: the seed-7 run was still descending at 2500 epochs
# (7.1 deg, best 6.58); extend to 6000. Seed 42 at 2500 guards against
# single-seed luck in the basin story.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }
# wait for ladder 1's last stage to release (poll its log, not processes)
while ! grep -q "ladder done" benchmarks/meshbank_ladder.log 2>/dev/null; do sleep 30; done
log "L4: seed 7, batch 128, lr 1e-3, 6000 ep"
timeout 4200 python -u benchmarks/meshbank_bench.py 128 6000 sinkhorn 1e-3 7 1.4096013153858628e-08 1.3111961119405346e-05 128 _s7long
log "L5: seed 42, batch 128, lr 1e-3, 2500 ep"
timeout 1800 python -u benchmarks/meshbank_bench.py 128 2500 sinkhorn 1e-3 42 1.4096013153858628e-08 1.3111961119405346e-05 128 _s42
log "ladder2 done"
