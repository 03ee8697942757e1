#!/bin/bash
# Round-4 queue 6: FFN-fusion A/B behind the tunnel outage.
# Waits for device enumeration to answer, then runs the pending
# training-step work in order.  Each step bounded; artifacts to
# chip_results/.
set -u
cd "$(dirname "$0")/.."
R=chip_results

# -- wait for tunnel recovery (probe every 2 min, give up after 4 h) --
for i in $(seq 1 120); do
  if python - <<'PY'
import sys
sys.path.insert(0, ".")
from vae_gslm_tpu.core.probe import probe_devices
sys.exit(0 if probe_devices(timeout_s=120) is None else 1)
PY
  then break; fi
  sleep 120
done

# 1) in-model FFN materialize A/B (interleaved, drift-cancelling)
timeout 1500 python tools/bench_ffn_fusion.py \
    > $R/ffn_fusion_ab.txt 2> $R/ffn_fusion_ab.err

echo done > $R/queue6.done
