#!/usr/bin/env python
"""TPU round-4 batch 3: first-IC latency, AOT vs jit+persistent-cache.

Batch 2 measured the fresh-process AOT path at 29.7 s deserialize +
6.5 s first run.  The control — the SAME fresh process paying jit
tracing + lowering + a persistent-cache hit instead (the cache was
primed by the batch-2 `--prime-aot` compile) — decides which path
bench.py should prefer.  Also repeats the AOT load once for variance.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AOT_DIR = os.path.join(ROOT, ".aot")
AOT_HIDDEN = os.path.join(ROOT, ".aot_hidden")


def run_bench(tag):
    t0 = time.time()
    r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                       capture_output=True, text=True, cwd=ROOT)
    print(f"=== bench.py {tag} (total {time.time() - t0:.1f}s, "
          f"rc={r.returncode}) ===", flush=True)
    print(r.stderr, flush=True)
    print(r.stdout, flush=True)


def main():
    # control: hide the AOT artifacts -> jit + persistent-cache path
    if os.path.isdir(AOT_DIR):
        shutil.move(AOT_DIR, AOT_HIDDEN)
    try:
        run_bench("jit+cache control")
    finally:
        if os.path.isdir(AOT_HIDDEN):
            shutil.move(AOT_HIDDEN, AOT_DIR)
    # AOT repeat (load-time variance)
    run_bench("aot repeat")
    print("BATCH3 DONE", flush=True)


if __name__ == "__main__":
    main()
