#!/usr/bin/env python
"""cfg5b stage attribution: builds+tables vs draws, and table-knob scaling.

Variants of the DM datagen batch program (1024 clusters, batches of 256):

  tables-only   : n_part=16    — builds + DFs + tables, negligible draws
  full          : n_part=1e5   — cfg5b
  ns512         : n_part=16, n_s 1024->512   (f_E lerp block + inversion halve)
  rows128       : n_part=16, n_rows 256->128 (lerp block + inversion halve,
                                              joint-table fold unchanged)
  rq1024        : n_part=16, rq 2048->1024   (joint table + its HBM halve)

full - tables-only attributes the draw stage; the knob rows separate the
f_E lerp block / inversion / joint-table shares.  Warm medians of 3.
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

    from cluster_generator_tpu.core.config import cgparams
    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import _datagen_batch_fn

    n_cl, n_batch, n_pts = 1024, 256, 512
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    def measure(tag, fn_builder):
        run_batch = fn_builder()

        def once(i):
            tot = 0.0
            for b0 in range(0, n_cl, n_batch):
                pos, vel, pm = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                         c[b0:b0 + n_batch], jax.random.key(i))
                tot += float(jnp.sum(pos[-1, -2:]) + jnp.sum(vel[-1, -2:]))
            return tot

        t0 = time.time()
        once(0)
        print(f"# {tag}: compile+first-run {time.time() - t0:.1f}s", flush=True)
        times = []
        for i in range(3):
            t0 = time.time()
            once(i + 1)
            times.append(time.time() - t0)
            print(f"# {tag}: warm {times[-1]:.3f}s", flush=True)
        print(f"RESULT {tag} median {sorted(times)[1]:.3f}s", flush=True)

    measure("tables-only-16", lambda: _datagen_batch_fn(n_pts, 16))
    measure("full-1e5", lambda: _datagen_batch_fn(n_pts, 100_000))
    measure("rows128-16", lambda: _datagen_batch_fn(n_pts, 16, n_rows=128))
    measure("rq1024-16", lambda: _datagen_batch_fn(n_pts, 16, rq=1024))

    num = cgparams["numerical"]
    old = num["velocity_table_speeds"]
    num["velocity_table_speeds"] = 512
    try:
        measure("ns512-16", lambda: _datagen_batch_fn(n_pts, 16))
    finally:
        num["velocity_table_speeds"] = old

    print("ATTR5B DONE", flush=True)


if __name__ == "__main__":
    main()
