#!/usr/bin/env python
"""Round-3: ensemble-mode table resolution trade (cfg5b's remaining cost).

cfg5b spends ~2.4 ms/halo building 256-row x n_s=512 x n_q=512 speed
tables. For ENSEMBLE datagen (1e5 draws per cluster), the table's
1/n_q=512 quantile resolution is far finer than the statistical
resolution of 1e5 samples. Measure a coarse variant (n_s=256, n_q=256)
against the production one: batch wall-time and the drawn speed
distribution (KS at 2e5 draws of a single cluster).

No product code changes — uses the existing speed_inverse_cdf_table
kwargs through a locally-built datagen batch.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SM = bool(os.environ.get("SMOKE"))


def log(msg):
    print(msg, flush=True)


def force(*xs):
    return float(sum(jnp.sum(jnp.ravel(x)[-2:]) for x in xs))


def timed(name, fn, *args, n=3):
    t0 = time.time()
    force(*fn(*args))
    c = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(*fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"{name:40s} compile+1st {c:7.2f}s  warm {med*1e3:9.1f} ms")
    return med


def make_batch(num_points, n_part, n_s, n_q, rq=2048):
    from cluster_generator_tpu.core.interp import adjacent_pairs
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster
    from cluster_generator_tpu.virial import (
        build_joint_speed_pairs,
        sample_speeds_joint,
        speed_inverse_cdf_table,
    )

    row_idx = np.unique(np.round(
        np.linspace(0, num_points - 1, 256)).astype(int))

    def _iso(key, n):
        k1, k2 = jax.random.split(key)
        mu = jax.random.uniform(k1, (n,), jnp.float32, -1.0, 1.0)
        phi = jax.random.uniform(k2, (n,), jnp.float32, 0.0,
                                 2.0 * float(np.pi))
        s = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), mu], axis=1)

    def one(m, c, key):
        f = build_one_cluster(m, c, num_points=num_points, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        df = f["dm_df"][::-1]
        row_ee = ee[row_idx]
        tab = speed_inverse_cdf_table(ee, df, row_ee=row_ee, n_s=n_s,
                                      n_q=n_q, table_dtype=jnp.float32)
        rr, mm = f["radius"], f["dark_matter_mass"]
        q = jnp.linspace(0.0, 1.0, rq)
        r_q = jnp.interp(q * mm[-1], mm, rr)
        r_pair = adjacent_pairs(r_q).astype(jnp.float32)
        joint = build_joint_speed_pairs(rr, -f["gravitational_potential"],
                                        row_ee, tab, r_q, dtype=tab.dtype)
        k_r, k_v, k_u, k_w = jax.random.split(key, 4)
        u = jax.random.uniform(k_r, (n_part,), jnp.float32)
        x = jnp.clip(u * (rq - 1), 0.0, rq - 1 - 1e-6)
        kq = jnp.minimum(x.astype(jnp.int32), rq - 2)
        wq = x - kq.astype(jnp.float32)
        rp = r_pair[kq]
        radius = (1.0 - wq) * rp[:, 0] + wq * rp[:, 1]
        speed = sample_speeds_joint(joint, tab.shape[1], kq, wq, k_v)
        pos = radius[:, None] * _iso(k_u, n_part)
        vel = speed[:, None].astype(jnp.float32) * _iso(k_w, n_part)
        return pos, vel

    @jax.jit
    def batch(M200, conc, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(M200.shape[0]))
        return jax.vmap(one)(M200, conc, keys)

    return batch


def main():
    from cluster_generator_tpu.parallel import sample_ensemble_params

    n_cl = 8 if SM else 256
    n_part = 2_000 if SM else 100_000
    n_pts = 128 if SM else 512
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    full = make_batch(n_pts, n_part, 512, 512)
    coarse = make_batch(n_pts, n_part, 256, 256)

    t_full = timed(f"full tables (512/512), {n_cl} clusters", full,
                   M, c, jax.random.key(0))
    t_coarse = timed(f"coarse tables (256/256), {n_cl} clusters", coarse,
                     M, c, jax.random.key(0))
    log(f"batch speedup {t_full/t_coarse:.2f}x "
        f"(projected cfg5b: {7.31 * t_coarse / t_full:.1f} s)")

    # distribution check at 2e5 draws of a single cluster
    from scipy.stats import ks_2samp

    nck = 2_000 if SM else 200_000
    f1 = make_batch(n_pts, nck, 512, 512)
    f2 = make_batch(n_pts, nck, 256, 256)
    _, v1 = f1(M[:1], c[:1], jax.random.key(5))
    _, v2 = f2(M[:1], c[:1], jax.random.key(6))
    s1 = np.linalg.norm(np.asarray(v1[0]), axis=1)
    s2 = np.linalg.norm(np.asarray(v2[0]), axis=1)
    stat, p = ks_2samp(s1, s2)
    log(f"speed KS full-vs-coarse: D={stat:.5f} p={p:.3f} "
        f"(n={nck}; D must sit at sampling noise for the trade to hold)")


if __name__ == "__main__":
    main()
