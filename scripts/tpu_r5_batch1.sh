#!/bin/bash
# Round-5 TPU batch 1 (one sequential process chain; never kill
# mid-compile):
#  1. cfg6 per-stage attribution (run + cold compile)    [VERDICT item 5]
#  2. cfg5d: 1e6 particles/cluster, 1.02e9-particle
#     streamed catalog + resume + QA gate                [VERDICT item 6]
#  3. full BASELINE config table at HEAD
#  4. prime the headline AOT artifact + persistent cache [VERDICT item 2]
#  5. headline bench with the primed caches (fresh process AOT load)
set -x
cd /root/repo
mkdir -p benchmarks/measurements_r5
python scripts/tpu_r5_stages_cfg6.py > benchmarks/measurements_r5/r5_cfg6_stages.log 2>&1
python scripts/tpu_r5_cfg5d.py > benchmarks/measurements_r5/r5_cfg5d.log 2>&1
python benchmarks/bench_configs.py all > benchmarks/measurements_r5/r5_configs.log 2>&1
python bench.py --prime-aot > benchmarks/measurements_r5/r5_prime.log 2>&1
python bench.py > benchmarks/measurements_r5/r5_bench.log 2>&1
echo "TPU_R5_BATCH1 DONE"
