#!/bin/bash
# Round-4 chip queue #2: quantization-quality table (VERDICT item 4)
# + training profile capture (item 3 attack data).
set -u
cd "$(dirname "$0")/.."
R=chip_results

for B in 8 64 128; do
  timeout 2400 python tools/bench_quant_quality.py $B 500 \
      > $R/quant_quality_b$B.txt 2> $R/quant_quality_b$B.err
done

timeout 900 python tools/profile_train.py /tmp/train_trace \
    > $R/profile_train.log 2>&1
python tools/xplane_top.py /tmp/train_trace 60 \
    > $R/train_top_ops.txt 2>&1

timeout 900 python tools/bench_training.py \
    > $R/bench_training_r4.json 2> $R/bench_training_r4.err

echo done > $R/queue5.done
