#!/bin/bash
# Poll the TPU backend; when it answers, run the pending round-4 batch 8
# (cfg5b/cfg5c re-measure at post-unification HEAD) exactly once.
# The probe is a trivial jit in a throwaway subprocess — safe to time
# out (never interrupts a real measurement compile).  Logs to
# benchmarks/measurements_r4/r4_batch8.log; touches .batch8_done on
# success so the session can pick the result up.
cd /root/repo
LOG=benchmarks/measurements_r4/r4_batch8.log
DEADLINE=$(( $(date +%s) + 6*3600 ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 900 python -c "
import jax, jax.numpy as jnp
float(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))
print('PROBE OK')
" >> "$LOG" 2>&1; then
    echo "### backend up at $(date -u +%H:%M:%S); running batch8" >> "$LOG"
    if timeout 5400 python scripts/tpu_r4_batch8.py >> "$LOG" 2>&1; then
      touch .batch8_done
      echo "### batch8 complete" >> "$LOG"
      exit 0
    fi
    echo "### batch8 attempt failed; re-probing" >> "$LOG"
  else
    echo "### probe failed/timed out at $(date -u +%H:%M:%S)" >> "$LOG"
  fi
  sleep 240
done
echo "### gave up after 6h" >> "$LOG"
exit 1
