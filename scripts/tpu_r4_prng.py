#!/usr/bin/env python
"""Threefry vs RBG PRNG for the draw stages (TPU).

The draw stages burn ~6-7 uniforms per particle; jax's default threefry
is compute-heavy on TPU while the `rbg` impl maps to XLA's native
RngBitGenerator.  Keys are CALLER-SUPPLIED throughout the framework
(`ensemble_datagen(key=...)`, `merger_ic_fused(key)`), so rbg is a
zero-code-change option if it measures faster — this script decides.

  raw      : 7 x 1.02e8 uniforms, fully consumed
  cfg5b    : 1024 x 1e5 datagen batch, threefry vs rbg keys
  headline : merger_ic_fused 1e7, threefry vs rbg keys
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


def median3(fn):
    fn(0)
    times = []
    for i in range(3):
        t0 = time.time()
        fn(i + 1)
        times.append(time.time() - t0)
    return sorted(times)[1]


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    # raw uniform throughput
    @jax.jit
    def burn(key):
        ks = jax.random.split(key, 7)
        tot = jnp.float32(0)
        for k in ks:
            u = jax.random.uniform(k, (102_400_000,), jnp.float32)
            tot += u[0] + u[-1] + jnp.sum(u[::65536])
        return tot

    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)
        t = median3(lambda i, key=key: float(burn(jax.random.fold_in(key, i))))
        print(f"RESULT raw7x1e8[{impl}] median {t:.3f}s", flush=True)

    # cfg5b with each key impl
    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import _datagen_batch_fn

    n_cl, n_batch = 1024, 256
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)
    run_batch = _datagen_batch_fn(512, 100_000)

    for impl in ("threefry2x32", "rbg"):
        key0 = jax.random.key(3, impl=impl)

        def once(i, key0=key0):
            tot = 0.0
            for b0 in range(0, n_cl, n_batch):
                pos, vel, pm = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                         c[b0:b0 + n_batch],
                                         jax.random.fold_in(key0, i))
                tot += float(jnp.sum(pos[-1, -2:]) + jnp.sum(vel[-1, -2:]))
            return tot

        t = median3(once)
        print(f"RESULT cfg5b[{impl}] median {t:.3f}s", flush=True)

    # headline merger with each key impl
    from cluster_generator_tpu.pipeline import merger_ic_fused

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0.0, 0.0], [1500.0, 0.0, 0.0]])
    vels = jnp.asarray([[0.3, 0.0, 0.0], [-0.45, 0.0, 0.0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    ng, nd, ns = ((3_000_000, 2_000_000), (2_400_000, 1_600_000),
                  (600_000, 400_000))
    jitted = jax.jit(lambda key: merger_ic_fused(
        M200, conc, centers, vels, rmax, key, ng, nd, ns))

    for impl in ("threefry2x32", "rbg"):
        key0 = jax.random.key(5, impl=impl)

        def once(i, key0=key0):
            p, _ = jitted(jax.random.fold_in(key0, i))
            return float(jnp.sum(p["dm", "particle_velocity"][::4096])
                         + jnp.sum(p["gas", "thermal_energy"][::4096]))

        t = median3(once)
        print(f"RESULT headline[{impl}] median {t:.3f}s", flush=True)

    print("PRNG DONE", flush=True)


if __name__ == "__main__":
    main()
