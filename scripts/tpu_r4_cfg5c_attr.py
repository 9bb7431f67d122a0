#!/usr/bin/env python
"""cfg5c stage attribution: where do the 3.75 s over cfg5b go?

Variants of the full-species datagen batch program (1024 clusters,
batches of 256), holding TOTAL draws fixed where possible:

  dm-only-1e5   : n=(100000, 0, 0)      — cfg5b equivalent via the full program
  dm+gas        : n=(60000, 40000, 0)   — adds the gas table4 path
  dm+star       : n=(90000, 0, 10000)   — adds the star DF + star speed table
  full          : n=(50000, 40000, 10000) — cfg5c

Differences between rows attribute the star-table, star-DF and gas-table
costs.  One process; warm medians of 3.
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


def _force(out):
    tot = 0.0
    for sp, arrs in out.items():
        tot += float(sum(jnp.sum(jnp.ravel(a)[-2:]) for a in arrs[:2]))
    return tot


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import _datagen_full_batch_fn

    n_cl, n_batch, n_pts = 1024, 256, 512
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    for tag, (nd, ng, ns) in [
        ("dm-only-1e5", (100_000, 0, 0)),
        ("dm+gas", (60_000, 40_000, 0)),
        ("dm+star", (90_000, 0, 10_000)),
        ("full", (50_000, 40_000, 10_000)),
    ]:
        run_batch = _datagen_full_batch_fn(n_pts, nd, ng, ns)

        def once(i):
            tot = 0.0
            for b0 in range(0, n_cl, n_batch):
                out = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                c[b0:b0 + n_batch], jax.random.key(i))
                tot += _force(out)
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

    print("ATTR DONE", flush=True)


if __name__ == "__main__":
    main()
