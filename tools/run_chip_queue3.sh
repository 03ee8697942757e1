#!/bin/bash
# B=32/64 mega-kernel bench points (streamed cold-cache slots,
# commit 00a5b83) — built round-3 tail, never measured: the axon
# tunnel died before the first run completed.
cd /root/repo || exit 1
log() { echo "[chip_queue3 $(date +%H:%M:%S)] $*"; }

log "bench B=32 mega (streamed slots)"
BENCH_BATCH=32 VAE_GSLM_MEGA_MAX_BATCH=32 timeout 2400 python bench.py \
    > chip_results/bench_b32_mega3.json 2> chip_results/bench_b32_mega3.err
log "bench B=64 mega (streamed slots)"
BENCH_BATCH=64 VAE_GSLM_MEGA_MAX_BATCH=64 timeout 2400 python bench.py \
    > chip_results/bench_b64_mega3.json 2> chip_results/bench_b64_mega3.err
log "DONE"
