#!/usr/bin/env python
"""Round-3: where does cfg2's 0.479 s go, and what would fix it?

cfg2 (model + DF + 1e6 virialized DM draws through the class-API math) is
the weakest headline ratio (56x vs 229x/422x for cfg1/cfg3).  Stages:

  S1 build_one_cluster(1000 pts, DF)      f64 HSE solve + Abel DF
  S2 speed_inverse_cdf_table (256 rows)
  S3 radius draws: jnp.interp(u*M, mm, rr) at 1e6, f64 (binary search)
  S4 psi(r): spline_eval at 1e6, f64
  S5 sample_speeds at 1e6 (f32 table path)

Candidates measured against S3/S4:

  C3 radius via a 4096-node f64 quantile table + computed-index lerp
     (one-time exact interp onto quantile nodes; draws search-free)
  C4 psi via computed log-grid index lerp (the build grid IS log-spaced;
     index = (log r - log r0) / dlog, no search) — linear not cubic, but
     psi is smooth and the table nodes are the same grid.

Run: nohup python scripts/tpu_r3_cfg2_ablation.py > /tmp/cfg2abl.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(msg, flush=True)


def force(x):
    return float(jnp.sum(jnp.ravel(x)[-2:]))


def timed(name, fn, *args, n=3):
    t0 = time.time()
    force(fn(*args))
    c = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"{name:38s} compile+1st {c:7.2f}s  warm {med*1e3:8.2f} ms")
    return med


def main():
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster
    from cluster_generator_tpu.core.interp import (
        adjacent_pairs,
        cubic_spline,
        spline_eval,
    )
    from cluster_generator_tpu.virial import (
        sample_speeds,
        speed_inverse_cdf_table,
        speed_table_defaults,
    )

    N = 1_000_000
    n_pts = 1000
    kw = speed_table_defaults()
    row_idx = np.unique(np.round(
        np.linspace(0, n_pts - 1, 256)).astype(int))

    build = jax.jit(lambda m: build_one_cluster(m, 4.0, num_points=n_pts,
                                                with_df=True))
    t1 = timed("S1 build_one_cluster(1000,df)",
               lambda m: build(m)["dm_df"], 1.5e15)
    f = build(1.5e15)
    ee = -f["gravitational_potential"][::-1]
    df = f["dm_df"][::-1]
    row_ee = ee[row_idx]

    tab_fn = jax.jit(lambda ee, df, row_ee: speed_inverse_cdf_table(
        ee, df, row_ee=row_ee, **kw))
    t2 = timed("S2 speed table (256 rows)", tab_fn, ee, df, row_ee)
    tab = tab_fn(ee, df, row_ee)

    rr, mm = f["radius"], f["dark_matter_mass"]

    @jax.jit
    def s3(key):
        u = jax.random.uniform(key, (N,))
        return jnp.interp(u * mm[-1], mm, rr)

    t3 = timed("S3 radius interp f64 (search)", s3, jax.random.key(0))
    radius = s3(jax.random.key(0))

    psi_grid = -f["gravitational_potential"]
    psi_sp = cubic_spline(rr, psi_grid)

    @jax.jit
    def s4(radius):
        return spline_eval(psi_sp, radius)

    t4 = timed("S4 psi spline_eval f64", s4, radius)
    psi_p = s4(radius)

    @jax.jit
    def s5(radius, psi_p, key):
        return sample_speeds(radius.astype(tab.dtype),
                             psi_p.astype(tab.dtype),
                             row_ee.astype(tab.dtype), tab, key)

    t5 = timed("S5 sample_speeds f32", s5, radius, psi_p,
               jax.random.key(1))

    # ---------------- candidates
    RQ = 4096
    q = jnp.linspace(0.0, 1.0, RQ)
    r_q = jnp.interp(q * mm[-1], mm, rr)  # one-time exact
    r_pair = adjacent_pairs(r_q)

    @jax.jit
    def c3(key):
        u = jax.random.uniform(key, (N,))
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        k = x.astype(jnp.int32)
        w = x - k
        rp = r_pair[k]
        return (1.0 - w) * rp[:, 0] + w * rp[:, 1]

    t3b = timed("C3 radius quantile-table f64", c3, jax.random.key(0))
    rc = c3(jax.random.key(0))
    from scipy.stats import ks_2samp
    stat, p = ks_2samp(np.asarray(radius), np.asarray(rc))
    log(f"  C3 vs S3 radius KS: D={stat:.5f} p={p:.3f}")

    lr0 = jnp.log(rr[0])
    dlr = (jnp.log(rr[-1]) - lr0) / (n_pts - 1)
    psi_pair = adjacent_pairs(psi_grid)

    @jax.jit
    def c4(radius):
        x = jnp.clip((jnp.log(radius) - lr0) / dlr, 0.0, n_pts - 1 - 1e-9)
        k = x.astype(jnp.int32)
        w = x - k
        pp = psi_pair[k]
        return (1.0 - w) * pp[:, 0] + w * pp[:, 1]

    t4b = timed("C4 psi computed-index lerp f64", c4, radius)
    err = float(jnp.max(jnp.abs((c4(radius) - psi_p) / psi_p)))
    log(f"  C4 vs S4 psi max rel err: {err:.2e}")

    tot = t1 + t2 + t3 + t4 + t5
    log(f"SPLIT: S1 {t1*1e3:.0f} S2 {t2*1e3:.0f} S3 {t3*1e3:.0f} "
        f"S4 {t4*1e3:.0f} S5 {t5*1e3:.0f} ms (sum {tot*1e3:.0f}; "
        f"cfg2 measured ~479)  |  C3 {t3b*1e3:.0f} C4 {t4b*1e3:.0f} ms")


if __name__ == "__main__":
    main()
