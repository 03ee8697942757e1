#!/bin/bash
# Chip-gated round-3 items, run unattended once the axon tunnel is back:
#   1. headline + serving-ladder bench points (B=128 / 16 / 8 / 32 / 64)
#   2. flagship-dims convergence smoke (VERDICT r2 item 6 chip half)
#   3. fuse-accumulation A/B (steady-state ms/step; decides the default)
#   4. microbatch grad timing (training step number)
#   5. single-chip entry() compile gate
# Results land in chip_results/ for STATUS/PERFORMANCE updates.
cd /root/repo || exit 1
mkdir -p chip_results
log() { echo "[chip_queue $(date +%H:%M:%S)] $*"; }

log "bench B=128"
timeout 2400 python bench.py > chip_results/bench_b128.json 2> chip_results/bench_b128.err
log "bench B=16"
BENCH_BATCH=16 timeout 2400 python bench.py > chip_results/bench_b16.json 2> chip_results/bench_b16.err
log "bench B=8"
BENCH_BATCH=8 timeout 2400 python bench.py > chip_results/bench_b8.json 2> chip_results/bench_b8.err
log "bench B=32"
BENCH_BATCH=32 timeout 2400 python bench.py > chip_results/bench_b32.json 2> chip_results/bench_b32.err
log "bench B=64"
BENCH_BATCH=64 timeout 2400 python bench.py > chip_results/bench_b64.json 2> chip_results/bench_b64.err

log "train smoke 300 steps"
timeout 5400 python tools/train_smoke.py 300 10 > chip_results/train_smoke.log 2>&1

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

log "DONE"
