#!/bin/bash
# Round-5 queue 9: (a) training step time with the restored
# five-matmul backward (the shipping default after the orient2
# measured-negative), (b) interleaved backward-variant A/B
# (full-matrix vs blockwise at T=641), (c) training-step profile for
# the next optimization target.
set -u
cd "$(dirname "$0")/.."
R=chip_results
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_chip
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

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

timeout 3600 python -u tools/bench_training.py \
    > $R/bench_training_r5b.json 2> $R/bench_training_r5b.err

timeout 3600 python -u tools/bench_bwd_variants.py \
    > $R/bwd_variants_r5.txt 2> $R/bwd_variants_r5.err

timeout 3600 python -u tools/profile_train.py /tmp/xplane_r5 \
    > $R/profile_train_r5.log 2>&1 || true

# a8 default decision needs SAME-SESSION pairs at the other mega
# batch points (B=8 pair measured in queue 8: 150.1 vs 144.6 median)
for B in 16 32; do
  BENCH_BATCH=$B BENCH_W_INT8=1 VAE_GSLM_MEGA_A8=1 timeout 3600 \
      python -u bench.py > $R/bench_b${B}_a8b.json 2> $R/bench_b${B}_a8b.err
  BENCH_BATCH=$B BENCH_W_INT8=1 timeout 3600 \
      python -u bench.py > $R/bench_b${B}_ctl_r5.json 2> $R/bench_b${B}_ctl_r5.err
done

echo done > $R/queue9.done
