#!/usr/bin/env python
"""Round-4 TPU measurement batch 1 (one process, warm-up amortized):

1. cfg5b ensemble datagen 1024x1e5 — after the uniform-node spline eval
   (VERDICT r3 item 4; r3 figure 8.59 s, target <= 7.3 s)
2. cfg5c full-species datagen 1024x1e5 (first TPU figure)
3. field 512^3 GRF: fused c64-fftn route vs staged rfft half-spectrum
   route (VERDICT r3 item 3; r3 figure 0.65 s, target <= ~0.54 s)

Protocol: docs/performance.md — one nohup process, compile+first-run
then 3 warm trials, scalar D2H checksums for honest completion.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def _force(*xs):
    return float(sum(jnp.sum(jnp.ravel(x)[-2:]) for x in xs))


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    from benchmarks.bench_configs import bench_cfg5b, bench_cfg5c

    print("=== cfg5b (uniform-node table path) ===", flush=True)
    bench_cfg5b()
    print("=== cfg5c ===", flush=True)
    bench_cfg5c()

    print("=== field 512^3: fftn vs staged rfft ===", flush=True)
    from cluster_generator_tpu.fields.grf import RandomMagneticField

    for use_rfft in (False, True):
        tag = "rfft" if use_rfft else "fftn"

        def once(i):
            f = RandomMagneticField([-1000.0] * 3, [1000.0] * 3,
                                    (512, 512, 512), 50.0, 500.0, 1.0e-6,
                                    padding=0.0, prng=42 + i,
                                    dtype=jnp.float32, use_rfft=use_rfft)
            return _force(f.gx, f.gy, f.gz)

        t0 = time.time()
        c0 = once(0)
        print(f"# field[{tag}]: compile+first-run {time.time() - t0:.1f}s "
              f"checksum={c0:.6g}", flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            once(i + 1)
            times.append(time.time() - t0)
            print(f"# field[{tag}]: warm {times[-1]:.3f}s", flush=True)
        med = sorted(times)[1]
        print(f"RESULT field_512_grf[{tag}] median {med:.3f}s", flush=True)

    print("BATCH1 DONE", flush=True)


if __name__ == "__main__":
    main()
