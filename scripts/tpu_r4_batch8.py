#!/usr/bin/env python
"""TPU round-4 batch 8: re-measure cfg5b/cfg5c at post-unification HEAD.

The datagen-core unification (int path now delegates to the full-species
core with gas=star=0, commit 5f2c70a) happened after batch 6's
cfg5b 4.03 s / cfg5c 4.69 s figures; the TPU backend then went UNAVAILABLE
for the rest of the round (r4_batch7.log).  This batch re-pins both
numbers at HEAD (expected: cfg5b 4.03-4.10 s — the unified core adds the
escape-speed cap the int path was missing; cfg5c unchanged).
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


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import (
        _datagen_batch_fn,
        _datagen_full_batch_fn,
    )

    n_cl, n_batch, n_pts = 1024, 256, 512
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    def measure(tag, run_batch, force):
        def once(i):
            tot = 0.0
            for b0 in range(0, n_cl, n_batch):
                out = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                c[b0:b0 + n_batch], jax.random.key(i))
                tot += force(out)
            return tot

        t0 = time.time()
        once(0)
        print(f"# {tag}: compile+first-run {time.time() - t0:.1f}s",
              flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            once(i + 1)
            times.append(time.time() - t0)
            print(f"# {tag}: warm {times[-1]:.3f}s", flush=True)
        print(f"RESULT {tag} median {sorted(times)[1]:.3f}s", flush=True)

    def force_dm(out):
        pos, vel, pm = out
        return float(jnp.sum(pos[-1, -2:]) + jnp.sum(vel[-1, -2:]))

    def force_full(out):
        tot = 0.0
        for sp, arrs in out.items():
            tot += float(sum(jnp.sum(jnp.ravel(a)[-2:]) for a in arrs[:2]))
        return tot

    measure("cfg5b-1e5", _datagen_batch_fn(n_pts, 100_000), force_dm)
    measure("cfg5c-full",
            _datagen_full_batch_fn(n_pts, 50_000, 40_000, 10_000),
            force_full)

    print("BATCH8 DONE", flush=True)


if __name__ == "__main__":
    main()
