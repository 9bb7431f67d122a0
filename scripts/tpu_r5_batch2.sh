#!/bin/bash
# Round-5 TPU batch 2: gather-layout experiment, then cfg5d at batch 16
set -x
cd /root/repo
python scripts/tpu_r5_gather_layout.py > benchmarks/measurements_r5/r5_gather_layout.log 2>&1
python scripts/tpu_r5_cfg5d.py > benchmarks/measurements_r5/r5_cfg5d.log 2>&1
echo "TPU_R5_BATCH2 DONE"
