#!/usr/bin/env python
"""Direct per-stage timing of the cfg5b table pipeline (cumulative jits).

The knob-scaling attribution (r4_cfg5b_attr.log) mis-localized the cost:
the banded-matmul joint fold saved only ~0.08 s (r4_batch4.log), so the
rq- and rows-proportional seconds live elsewhere.  Measure cumulative
programs P0..P4 over 1024 clusters (batches of 256); consecutive
differences attribute each stage:

  P0: HSE build + Eddington DF
  P1: P0 + speed_inverse_cdf_table (E-block + cumsum + inversion)
  P2: P1 + radius-quantile nodes r_q (mass-CDF interp)
  P3: P2 + joint fold (psi interp + searchsorted + matmul + materialize)
  P4: P3 + 16 draws  (should reproduce tables-only-16 ~3.9 s)
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


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    from cluster_generator_tpu.core.interp import adjacent_pairs
    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster
    from cluster_generator_tpu.virial import (
        build_joint_speed_pairs,
        sample_speeds_joint,
        speed_inverse_cdf_table,
        speed_table_defaults,
    )

    n_cl, n_batch, n_pts, n_rows, rq = 1024, 256, 512, 256, 2048
    kw = speed_table_defaults()
    row_idx = np.unique(np.round(
        np.linspace(0, n_pts - 1, n_rows)).astype(int))
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    def p0(m, cc, key):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        return jnp.sum(f["dm_df"]) + f["radius"][-1]

    def p1(m, cc, key):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        tab = speed_inverse_cdf_table(ee, f["dm_df"][::-1],
                                      row_ee=ee[row_idx], **kw)
        return jnp.sum(tab) + f["radius"][-1]

    def p2(m, cc, key):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        tab = speed_inverse_cdf_table(ee, f["dm_df"][::-1],
                                      row_ee=ee[row_idx], **kw)
        rr, mm = f["radius"], f["dark_matter_mass"]
        q = jnp.linspace(0.0, 1.0, rq)
        r_q = jnp.interp(q * mm[-1], mm, rr)
        return jnp.sum(tab) + jnp.sum(r_q)

    def p3(m, cc, key):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        row_ee = ee[row_idx]
        tab = speed_inverse_cdf_table(ee, f["dm_df"][::-1],
                                      row_ee=row_ee, **kw)
        rr, mm = f["radius"], f["dark_matter_mass"]
        q = jnp.linspace(0.0, 1.0, rq)
        r_q = jnp.interp(q * mm[-1], mm, rr)
        joint = build_joint_speed_pairs(rr, -f["gravitational_potential"],
                                        row_ee, tab, r_q, dtype=tab.dtype)
        return jnp.sum(joint) + jnp.sum(r_q)

    def p4(m, cc, key):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        row_ee = ee[row_idx]
        tab = speed_inverse_cdf_table(ee, f["dm_df"][::-1],
                                      row_ee=row_ee, **kw)
        rr, mm = f["radius"], f["dark_matter_mass"]
        q = jnp.linspace(0.0, 1.0, rq)
        r_q = jnp.interp(q * mm[-1], mm, rr)
        r_pair = adjacent_pairs(r_q).astype(jnp.float32)
        joint = build_joint_speed_pairs(rr, -f["gravitational_potential"],
                                        row_ee, tab, r_q, dtype=tab.dtype)
        k_r, k_v = jax.random.split(key)
        u = jax.random.uniform(k_r, (16,), jnp.float32)
        x = jnp.clip(u * (rq - 1), 0.0, rq - 1 - 1e-6)
        kq = jnp.minimum(x.astype(jnp.int32), rq - 2)
        wq = x - kq.astype(jnp.float32)
        rp = r_pair[kq]
        radius = (1.0 - wq) * rp[:, 0] + wq * rp[:, 1]
        speed = sample_speeds_joint(joint, tab.shape[1], kq, wq, k_v)
        return jnp.sum(radius) + jnp.sum(speed) + jnp.sum(joint)

    for tag, one in [("P0-build+df", p0), ("P1-+speedtable", p1),
                     ("P2-+rq", p2), ("P3-+joint", p3), ("P4-+draw16", p4)]:
        @jax.jit
        def batch(M200, conc, key, one=one):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(M200.shape[0]))
            return jnp.sum(jax.vmap(one)(M200, conc, keys))

        def once(i):
            tot = 0.0
            for b0 in range(0, n_cl, n_batch):
                tot += float(batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                   c[b0:b0 + n_batch], jax.random.key(i)))
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

    print("STAGES DONE", flush=True)


if __name__ == "__main__":
    main()
