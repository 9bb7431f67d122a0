#!/usr/bin/env python
"""End-to-end `ensemble_datagen` measurement WITH HDF5 writes (TPU).

The cfg5b/cfg5c rows time the jitted batch programs with checksum
forcing; the product path adds the device->host transfer and the h5py
writes (overlapped with the next batch's compute).  256 clusters keeps
the run tunnel-D2H-bounded but short; the per-cluster rate extrapolates.

DM-only: 256 x 1e5 -> ~0.6 GB on disk.  Full-species: same counts as
cfg5c -> ~0.7 GB.
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
    from cluster_generator_tpu.parallel.ensemble import ensemble_datagen

    n_cl = 256
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)
    out_dir = "/tmp/datagen_e2e"
    os.makedirs(out_dir, exist_ok=True)

    # BASELINE "clusters/sec for 1e6-particle ICs" re-measure (the r3 row
    # was 33 clusters/s; the r4 table-path wins apply here too)
    from cluster_generator_tpu.parallel.ensemble import _datagen_batch_fn

    n64 = 64
    run_batch = _datagen_batch_fn(512, 1_000_000)
    M64, c64 = sample_ensemble_params(jax.random.key(11), n64)

    def once(i):
        tot = 0.0
        for b0 in range(0, n64, 16):
            pos, vel, pm = run_batch(M64[b0:b0 + 16] * (1 + 1e-6 * i),
                                     c64[b0:b0 + 16], jax.random.key(i))
            tot += float(jnp.sum(pos[-1, -2:]) + jnp.sum(vel[-1, -2:]))
        return tot

    t0 = time.time()
    once(0)
    print(f"# 1e6-ic-64: compile+first-run {time.time() - t0:.1f}s",
          flush=True)
    times = []
    for i in range(3):
        t0 = time.time()
        once(i + 1)
        times.append(time.time() - t0)
        print(f"# 1e6-ic-64: warm {times[-1]:.3f}s "
              f"({n64 / times[-1]:.1f} clusters/s)", flush=True)
    print(f"RESULT 1e6_ic_64 median {sorted(times)[1]:.3f}s", flush=True)

    for tag, counts in [
        ("dm-only", 100_000),
        ("full-species", {"dm": 50_000, "gas": 40_000, "star": 10_000}),
    ]:
        for trial in range(3):
            fn = os.path.join(out_dir, f"{tag}-{trial}.h5")
            t0 = time.time()
            ensemble_datagen(M, c, fn, counts, batch_size=128,
                             num_points=512, key=jax.random.key(trial),
                             overwrite=True)
            dt = time.time() - t0
            sz = os.path.getsize(fn) / 1e9
            print(f"# e2e[{tag}] trial {trial}: {dt:.2f}s "
                  f"({n_cl / dt:.1f} clusters/s, {sz:.2f} GB, "
                  f"{sz / dt * 1e3:.0f} MB/s to disk)", flush=True)
            os.remove(fn)
        print(f"RESULT e2e_{tag} done", flush=True)

    # cfg4's output clause: 1e7-particle merger IC -> Gadget HDF5 on disk
    # (BASELINE.json config 4).  The D2H of ~0.3 GB rides the axon tunnel
    # here; on a co-located host it is PCIe.
    from cluster_generator_tpu.pipeline import binary_merger_ic

    for trial in range(2):
        fn = os.path.join(out_dir, f"merger-{trial}.h5")
        t0 = time.time()
        parts, fields, tables = binary_merger_ic(
            [1.5e15, 1.0e15], [4.0, 5.0],
            [[8500.0, 10000.0, 10000.0], [11500.0, 10000.0, 10000.0]],
            [[0.3, 0.0, 0.0], [-0.45, 0.0, 0.0]],
            {"gas": 5_000_000, "dm": 4_000_000, "star": 1_000_000},
            key=jax.random.key(trial))
        t_ic = time.time() - t0
        from cluster_generator_tpu.particles import ClusterParticles

        species = sorted({k[0] for k in parts})
        container = ClusterParticles(species, parts)  # D2H happens here
        t_d2h = time.time() - t0 - t_ic
        t0 = time.time()
        container.write_to_gadget_file(fn, 20000.0, overwrite=True)
        t_write = time.time() - t0
        sz = os.path.getsize(fn) / 1e9
        print(f"# merger+gadget trial {trial}: IC {t_ic:.2f}s + D2H "
              f"{t_d2h:.2f}s + write {t_write:.2f}s ({sz:.2f} GB)",
              flush=True)
        os.remove(fn)
    print("RESULT merger_gadget done", flush=True)

    print("E2E DONE", flush=True)


if __name__ == "__main__":
    main()
