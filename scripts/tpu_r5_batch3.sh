#!/bin/bash
# Round-5 TPU batch 3 (round-exit priming — runs AFTER the cfg5d run):
#  1. re-prime the headline AOT artifact at the final HEAD (the
#     transposed-column-gather commit changed the lowered program, so
#     the 14:15 artifact is fingerprint-stale)            [VERDICT item 2]
#  2. fresh-process headline bench with the primed artifact
#  3. cfg5c datagen-product AOT prime + fresh-process first-batch
#     measure                                             [VERDICT item 2]
set -x
cd /root/repo
python bench.py --prime-aot > benchmarks/measurements_r5/r5_prime2.log 2>&1
python bench.py > benchmarks/measurements_r5/r5_bench2.log 2>&1
python scripts/tpu_r5_cfg5c_aot.py prime \
  > benchmarks/measurements_r5/r5_cfg5c_aot_prime.log 2>&1
python scripts/tpu_r5_cfg5c_aot.py measure \
  > benchmarks/measurements_r5/r5_cfg5c_aot_measure.log 2>&1
echo "TPU_R5_BATCH3 DONE"
