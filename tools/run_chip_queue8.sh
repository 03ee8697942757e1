#!/bin/bash
# Round-5 queue 8: (a) clean re-run of the FA2 dual-orientation
# backward A/B (bench_flash_train must run with the host CPU idle —
# slope timing is host-driven), (b) training step time after the new
# backward, (c) mega-kernel s8xs8 dense-matmul (a8) speed A/B at
# B=8/32, (d) a8 quality rung.  Artifacts to chip_results/.
set -u
cd "$(dirname "$0")/.."
R=chip_results
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_chip
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

# -- wait for device enumeration (probe every 2 min, give up after 2 h)
for i in $(seq 1 60); do
  if python - <<'PY'
import sys
sys.path.insert(0, ".")
from vae_gslm_tpu.core.probe import probe_devices
sys.exit(0 if probe_devices(timeout_s=120) is None else 1)
PY
  then break; fi
  sleep 120
done

# 1) FA2 backward: clean interleaved timing
timeout 3600 python -u tools/bench_flash_train.py \
    > $R/flash_train_r5.txt 2> $R/flash_train_r5.err

# 2) training step after the new backward
timeout 3600 python -u tools/bench_training.py \
    > $R/bench_training_r5.json 2> $R/bench_training_r5.err

# 3) mega a8 speed A/B at B=8 (and the control re-measure)
BENCH_BATCH=8 BENCH_W_INT8=1 VAE_GSLM_MEGA_A8=1 timeout 3600 \
    python -u bench.py > $R/bench_b8_a8.json 2> $R/bench_b8_a8.err
BENCH_BATCH=8 BENCH_W_INT8=1 timeout 3600 \
    python -u bench.py > $R/bench_b8_ctl_r5.json 2> $R/bench_b8_ctl_r5.err

# 4) a8 at B=32 (no mm_chunk temp -> VMEM relief; possible win there too)
BENCH_BATCH=32 BENCH_W_INT8=1 VAE_GSLM_MEGA_A8=1 timeout 3600 \
    python -u bench.py > $R/bench_b32_a8.json 2> $R/bench_b32_a8.err

# 5) a8 quality rung at B=8 (shipped-default candidate must hold the band)
if [ ! -f /tmp/smoke_ckpt_r5.npz ]; then
  timeout 2400 python tools/train_smoke.py 300 50 /tmp/smoke_ckpt_r5.npz \
      > $R/train_smoke_r5b.log 2>&1
fi
if [ -f /tmp/smoke_ckpt_r5.npz ]; then
  VAE_GSLM_MEGA_A8=1 timeout 3000 \
      python tools/bench_quant_quality.py 8 500 /tmp/smoke_ckpt_r5.npz \
      > $R/quant_quality_b8_a8.txt 2> $R/quant_quality_b8_a8.err
fi

echo done > $R/queue8.done
