#!/bin/bash
# Supplemental meshbank ladder (runs concurrently with queue r5b; the axon
# tunnel multiplexes clients). Seeds + batch at the known-good lr 1e-3.
cd /root/repo || exit 1
log() { echo "=== $(date +%H:%M:%S) $* ==="; }
log "L1: seed 7, batch 128, lr 1e-3, 2500 ep"
timeout 1500 python -u benchmarks/meshbank_bench.py 128 2500 sinkhorn 1e-3 7 1.4096013153858628e-08 1.3111961119405346e-05 128 _s7
log "L2: seed 1234, batch 32, lr 1e-3, 5000 ep"
timeout 1500 python -u benchmarks/meshbank_bench.py 128 5000 sinkhorn 1e-3 1234 1.4096013153858628e-08 1.3111961119405346e-05 32 _b32long
log "L3: seed 7, batch 32, lr 1e-3, 5000 ep"
timeout 1500 python -u benchmarks/meshbank_bench.py 128 5000 sinkhorn 1e-3 7 1.4096013153858628e-08 1.3111961119405346e-05 32 _s7b32
log "ladder done"
