#!/bin/bash
# Round-4 final TPU sequence (launch when the backend is back):
#  1. cfg5b/cfg5c re-measure at post-unification HEAD (batch8)
#  2. re-prime the AOT artifact + persistent jax cache at HEAD
#  3. headline bench with the primed caches
#  4. full BASELINE config table at HEAD
# One sequential shell: never kill mid-compile.
set -x
cd /root/repo
python scripts/tpu_r4_batch8.py
python bench.py --prime-aot
python bench.py
python benchmarks/bench_configs.py all
echo "TPU_R4_FINAL DONE"
