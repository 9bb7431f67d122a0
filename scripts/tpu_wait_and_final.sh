#!/bin/bash
# Poll the TPU backend; when it answers, run the FULL round-4 final
# sequence exactly once (supersedes tpu_wait_and_batch8.sh, which only
# covered stage 1):
#   1. cfg5b/cfg5c re-measure at post-unification HEAD (batch8)
#   2. re-prime the AOT artifact + persistent jax cache at HEAD
#   3. headline bench with the primed caches
#   4. full BASELINE config table at HEAD
# The probe is a trivial jit in a throwaway subprocess - safe to time
# out (never interrupts a real measurement compile).  Stage markers
# (.r4final_stageN) record progress; logs go to
# benchmarks/measurements_r4/r4_final.log.
cd /root/repo
LOG=benchmarks/measurements_r4/r4_final.log
DEADLINE=$(( $(date +%s) + 12*3600 ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 900 python -c "
import jax, jax.numpy as jnp
float(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))
print('PROBE OK')
" >> "$LOG" 2>&1; then
    echo "### backend up at $(date -u +%H:%M:%S); running final sequence" >> "$LOG"
    if [ ! -f .r4final_stage1 ]; then
      if timeout 5400 python scripts/tpu_r4_batch8.py >> "$LOG" 2>&1; then
        touch .r4final_stage1 .batch8_done
        echo "### stage1 (batch8) complete" >> "$LOG"
      else
        echo "### stage1 attempt failed; re-probing" >> "$LOG"
        sleep 240; continue
      fi
    fi
    if [ ! -f .r4final_stage2 ]; then
      if timeout 5400 python bench.py --prime-aot >> "$LOG" 2>&1; then
        touch .r4final_stage2
        echo "### stage2 (prime-aot) complete" >> "$LOG"
      else
        echo "### stage2 attempt failed; re-probing" >> "$LOG"
        sleep 240; continue
      fi
    fi
    if [ ! -f .r4final_stage3 ]; then
      if timeout 3600 python bench.py >> "$LOG" 2>&1; then
        touch .r4final_stage3
        echo "### stage3 (headline bench) complete" >> "$LOG"
      else
        echo "### stage3 attempt failed; re-probing" >> "$LOG"
        sleep 240; continue
      fi
    fi
    if [ ! -f .r4final_stage4 ]; then
      if timeout 7200 python benchmarks/bench_configs.py all >> "$LOG" 2>&1; then
        touch .r4final_stage4
        echo "### stage4 (config table) complete" >> "$LOG"
      else
        echo "### stage4 attempt failed; re-probing" >> "$LOG"
        sleep 240; continue
      fi
    fi
    echo "### TPU_R4_FINAL DONE at $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  else
    echo "### probe failed/timed out at $(date -u +%H:%M:%S)" >> "$LOG"
  fi
  sleep 240
done
echo "### gave up after 12h" >> "$LOG"
exit 1
