#!/bin/bash
# Remaining round-3 chip items (tunnel died mid-queue on the first pass):
#   1. fuse-accum A/B (decides the default)
#   2. microbatch grad timing with the new flash fwd/bwd kernels
#   3. entry() compile gate
#   4. fresh headline bench point at current HEAD
cd /root/repo || exit 1
mkdir -p chip_results
log() { echo "[chip_queue2 $(date +%H:%M:%S)] $*"; }

log "fuse-accum A/B (40 steps each)"
timeout 2400 python tools/train_smoke.py 40 5 > chip_results/smoke_nofuse.log 2>&1
VAE_GSLM_FUSE_ACCUM=1 timeout 2400 python tools/train_smoke.py 40 5 \
    > chip_results/smoke_fuse.log 2>&1

log "microbatch grad timing"
timeout 1800 python tools/bench_training.py \
    > chip_results/bench_training.json 2> chip_results/bench_training.err

log "entry() compile gate"
timeout 1800 python -c "from __graft_entry__ import entry; import jax; \
fn,a=entry(); jax.jit(fn).lower(*a).compile(); print('entry compile OK')" \
    > chip_results/entry_gate.log 2>&1

log "headline bench at HEAD"
timeout 2400 python bench.py > chip_results/bench_b128_head.json 2> chip_results/bench_b128_head.err

log "DONE"
