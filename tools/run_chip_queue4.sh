#!/bin/bash
# Round-4 unattended chip queue: B=64 per-layer localization.
# Start AFTER any in-flight bench exits (caller serializes).
set -u
cd "$(dirname "$0")/.."
R=chip_results

# 1) decode-stage split at B=64 and B=128 (full AR / trunk-only /
#    dense-matmul floor) — localizes the B=64 per-layer pathology.
timeout 900 python tools/bench_decode.py 64 500 \
    > $R/decode_b64_r4.txt 2> $R/decode_b64_r4.err
timeout 900 python tools/bench_decode.py 128 500 \
    > $R/decode_b128_r4.txt 2> $R/decode_b128_r4.err

# 2) pipeline stage split at B=64, per-layer path forced.
VAE_GSLM_HYBRID_MAX_BATCH=0 timeout 900 python tools/bench_stages.py 64 \
    > $R/stages_b64_perlayer_r4.txt 2> $R/stages_b64_perlayer_r4.err

echo done > $R/queue4.done
