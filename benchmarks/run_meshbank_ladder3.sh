#!/bin/bash
# Meshbank ladder 3: PCRNet iteration depth at the winning seed/lr/batch.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }
log "L6: seed 7, b128, lr 1e-3, 4000 ep, pcr 5"
timeout 2400 python -u benchmarks/meshbank_bench.py 128 4000 sinkhorn 1e-3 7 1.4096013153858628e-08 1.3111961119405346e-05 128 _s7pcr5 5
log "L7: seed 7, b128, lr 1e-3, 4000 ep, pcr 8 (reference model default)"
timeout 2400 python -u benchmarks/meshbank_bench.py 128 4000 sinkhorn 1e-3 7 1.4096013153858628e-08 1.3111961119405346e-05 128 _s7pcr8 8
log "ladder3 done"
