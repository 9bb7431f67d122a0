#!/usr/bin/env python
"""cfg5d: the datagen scale pushed one decade to 1e6 particles/cluster
(VERDICT r5 item 6) — 1024 clusters x (5e5 DM + 4e5 gas + 1e5 star)
= 1.024e9 particles streamed to ONE resumable HDF5 catalog with the
physics QA gate run on a sample.

Reports: end-to-end wall (stream incl. raw writes), compute-only batch
rate (same compiled program), peak HBM per batch (the envelope: max
feasible per-cluster count at this batch size), a crash-simulated
resume, and the QA verdict.
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
import numpy as np

CATALOG = "/root/r5_cfg5d.h5"
# batch 16: the [B*5e5, 4] radius-gather temp pads 32x under T(8,128)
# (batch 64 OOM'd at compile: 15.26 G for that one temp, r5_cfg5d.log);
# 16 x 5e5 x 4 x 4 B x 32 = 4.1 G fits alongside the tables
N_CL, BATCH, N_PTS = 1024, 16, 512
COUNTS = {"dm": 500_000, "gas": 400_000, "star": 100_000}


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    import h5py

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        sample_ensemble_params,
        verify_catalog,
    )
    from cluster_generator_tpu.parallel.ensemble import (
        _datagen_full_batch_fn,
    )

    M, c = sample_ensemble_params(jax.random.key(55), N_CL)
    key = jax.random.key(19)

    if os.path.exists(CATALOG):
        os.remove(CATALOG)
    t0 = time.time()
    ensemble_datagen(M, c, CATALOG, COUNTS, batch_size=BATCH,
                     num_points=N_PTS, key=key)
    e2e = time.time() - t0
    nbytes = os.path.getsize(CATALOG)
    tot = N_CL * sum(COUNTS.values())
    print(f"# cfg5d e2e stream: {e2e:.1f}s for {N_CL} clusters x "
          f"{sum(COUNTS.values()):.0f} = {tot:.3g} particles "
          f"({N_CL / e2e:.2f} clusters/s, {nbytes / 1e9:.2f} GB, "
          f"{nbytes / 1e6 / e2e:.1f} MB/s to disk)", flush=True)

    # compute-only rate: same compiled program (memoized factory)
    fn = _datagen_full_batch_fn(N_PTS, COUNTS["dm"], COUNTS["gas"],
                                COUNTS["star"])
    Mj, cj = jnp.asarray(M), jnp.asarray(c)

    def compute_only():
        acc = 0.0
        for b0 in range(0, 256, BATCH):
            out = fn(Mj[b0:b0 + BATCH], cj[b0:b0 + BATCH],
                     jax.random.fold_in(key, b0))
            acc += float(jnp.sum(out["dm"][0][:, ::4096])
                         + jnp.sum(out["gas"][1][:, ::4096]))
        return acc

    compute_only()  # warm (program already compiled by the stream)
    times = []
    for _ in range(3):
        t0 = time.time()
        compute_only()
        times.append(time.time() - t0)
    w = sorted(times)[1]
    print(f"# cfg5d compute-only: {w:.2f}s for 256 clusters "
          f"({256 / w:.1f} clusters/s, "
          f"{256 * sum(COUNTS.values()) / w / 1e6:.0f} M particles/s)",
          flush=True)

    # HBM envelope at this batch size
    try:
        ms = jax.local_devices()[0].memory_stats()
        peak = ms.get("peak_bytes_in_use", 0)
        lim = ms.get("bytes_limit", 0)
        print(f"# HBM: peak {peak / 1e9:.2f} GB of {lim / 1e9:.2f} GB "
              f"limit at batch={BATCH}, 1e6/cluster -> max per-cluster "
              f"count at this batch ~{1e6 * lim / max(peak, 1):.2g} "
              "(linear extrapolation; tables are subdominant)",
              flush=True)
    except Exception as e:  # axon may not expose memory_stats
        print(f"# HBM stats unavailable: {e}", flush=True)

    # crash-simulated resume: drop the last two batches + one dataset
    t0 = time.time()
    with h5py.File(CATALOG, "a") as f:
        del f.attrs["complete"]
        done = [b for b in np.asarray(f.attrs["_batches_done"]).tolist()
                if b < (N_CL - 2 * BATCH)]
        f.attrs["_batches_done"] = np.asarray(done, np.int64)
        for i in range(N_CL - 2 * BATCH, N_CL):
            if f"cluster_{i:06d}" in f:
                del f[f"cluster_{i:06d}"]
    ensemble_datagen(M, c, CATALOG, COUNTS, batch_size=BATCH,
                     num_points=N_PTS, key=key, resume=True)
    print(f"# resume (2 batches recomputed + spliced): "
          f"{time.time() - t0:.1f}s", flush=True)

    # physics QA gate on a sample (first/middle/last + resumed region)
    t0 = time.time()
    idx = [0, 1, N_CL // 2, N_CL - 2 * BATCH, N_CL - 1]
    rep = verify_catalog(CATALOG, indices=idx)
    print(f"# verify_catalog({idx}): violations={rep['violations']} "
          f"max_speed_frac={rep['max_speed_frac']:.6f} "
          f"max_energy_rel_err={rep['max_energy_rel_err']:.2e} "
          f"({time.time() - t0:.1f}s)", flush=True)
    print("# cfg5d DONE")


if __name__ == "__main__":
    main()
