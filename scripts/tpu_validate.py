#!/usr/bin/env python
"""One-shot TPU validation + profiling session (run manually; not part of
the test suite).  Batches every real-chip experiment into a single process
to amortize the environment's per-process compiler warm-up."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def force(x):
    """Honest completion: tiny device->host transfer."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(jnp.ravel(l)[-2:]) for l in leaves))


def main():
    log(f"devices: {jax.devices()}")

    # ---------------------------------------------------------------- 1.
    log("== 1. bench pipeline with rbg PRNG ==")
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic,
    )

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    ng, nd, ns = ((3_000_000, 2_000_000), (2_400_000, 1_600_000),
                  (600_000, 400_000))

    def run(key):
        f = build_merger_models(M200, conc)
        tb = build_speed_tables(f)
        tb["radius"] = build_radius_tables(f, rmax)
        p = sample_merger_ic(f, tb, centers, vels, rmax, key, ng, nd, ns)
        return force((p["dm", "particle_velocity"][::4096],
                      p["gas", "thermal_energy"][::4096]))

    t = time.time()
    run(jax.random.key(0))
    log(f"threefry compile+run {time.time()-t:.1f}s")
    for i in range(2):
        t = time.time()
        run(jax.random.key(i + 1))
        log(f"threefry warm {time.time()-t:.3f}s")

    for impl in ["rbg"]:
        with jax.default_prng_impl(impl):
            t = time.time()
            run(jax.random.key(100))
            log(f"{impl} compile+run {time.time()-t:.1f}s")
            for i in range(2):
                t = time.time()
                run(jax.random.key(101 + i))
                log(f"{impl} warm {time.time()-t:.3f}s")

    # ---------------------------------------------------------------- 2.
    log("== 2. pallas invert_cdf_rows on real TPU ==")
    from cluster_generator_tpu.ops.pallas_kernels import (
        invert_cdf_rows,
        invert_cdf_rows_reference,
    )

    rng = np.random.RandomState(0)
    pdf = rng.rand(1000, 1023).astype(np.float32) + 0.05
    cdf = np.concatenate([np.zeros((1000, 1), np.float32),
                          np.cumsum(pdf, axis=1)], axis=1)
    cdf /= cdf[:, -1:]
    cdf_j = jnp.asarray(cdf)
    try:
        t = time.time()
        out = invert_cdf_rows(cdf_j, n_q=512)
        force(out)
        log(f"pallas compile+run {time.time()-t:.1f}s")
        t = time.time()
        out = invert_cdf_rows(cdf_j * 1.0, n_q=512)
        force(out)
        log(f"pallas warm {time.time()-t:.3f}s")
        t = time.time()
        ref = invert_cdf_rows_reference(cdf_j, n_q=512)
        force(ref)
        t_ref_c = time.time() - t
        t = time.time()
        ref = invert_cdf_rows_reference(cdf_j * 1.0, n_q=512)
        force(ref)
        log(f"vmapped-interp compile {t_ref_c:.1f}s warm {time.time()-t:.3f}s")
        err = float(jnp.max(jnp.abs(out - ref)))
        log(f"pallas vs reference max err: {err:.2e}")
    except Exception as e:
        log(f"PALLAS FAILED: {type(e).__name__}: {e}")

    # ---------------------------------------------------------------- 2b.
    log("== 2b. every model field finite ON DEVICE ==")
    # Regression for the TPU f64-emulation underflow: mp (8.4e-58) and keV
    # (7.3e-61) individually fall outside the emulated-f64 exponent range
    # (float32's), which made temperature/entropy NaN on TPU while every
    # CPU test stayed green.  Constants must reach the device pre-folded.
    f1 = build_merger_models(M200, conc)
    for name, arr in f1.items():
        bad = int(jnp.sum(~jnp.isfinite(arr)))
        log(f"   {name}: {'OK' if bad == 0 else f'{bad} NON-FINITE'}")
        assert bad == 0, f"{name} has {bad} non-finite values on TPU"

    # ---------------------------------------------------------------- 3.
    log("== 3. ensemble throughput (256 clusters, 512-pt grids) ==")
    from cluster_generator_tpu.parallel import (
        build_ensemble,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(7), 256)
    t = time.time()
    out = build_ensemble(M, c, num_points=512)
    force(out["dm_df"])
    log(f"ensemble compile+run {time.time()-t:.1f}s")
    t = time.time()
    out = build_ensemble(M * 1.001, c, num_points=512)
    force(out["dm_df"])
    dt = time.time() - t
    log(f"ensemble warm {dt:.2f}s -> {256/dt:.1f} clusters/s (full HSE+DF)")

    log("DONE")


if __name__ == "__main__":
    main()
