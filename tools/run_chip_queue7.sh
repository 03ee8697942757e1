#!/bin/bash
# Round-5 queue 7: quantization-quality rungs for EVERY shipped batch
# point (VERDICT r4 item 1a).  Trains the flagship-dims smoke
# checkpoint first (sharp logits — random init reads the chance
# floor), then runs the quality ladder at B=8/16/32 with per-sequence
# div@ distributions.  Artifacts to chip_results/.
set -u
cd "$(dirname "$0")/.."
R=chip_results

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

# 1) trained smoke checkpoint (300 flagship-dims steps)
if [ ! -f /tmp/smoke_ckpt_r5.npz ]; then
  timeout 1800 python tools/train_smoke.py 300 50 /tmp/smoke_ckpt_r5.npz \
      > $R/train_smoke_r5.log 2>&1
fi

# 2) quality ladder at every shipped batch point
for B in 8 16 32; do
  timeout 3000 python tools/bench_quant_quality.py $B 500 /tmp/smoke_ckpt_r5.npz \
      > $R/quant_quality_r5_b$B.txt 2> $R/quant_quality_r5_b$B.err
done

echo done > $R/queue7.done
