#!/usr/bin/env python
"""Round-2 TPU experiments: attack the draw stage's gather floor.

Round-1 ablation (docs/performance.md): 625 ms of the 940 ms 1e7-particle
draw is table gathers (~100M gathers/s).  Hypotheses to measure on the
real chip, batched into ONE process (axon per-process warm-up is ~200 s):

  A. gather microbenchmarks: scalar vs row-of-2 vs row-of-4 gathers, f32
     vs bf16 — does fetching a small contiguous row cost one gather?
  B. collisionless draw variants at 4e6 particles:
       v0: current (8 gathers: radius lerp 2 + psi lerp 2 + speed bilin 4)
       v1: joint table on the radius-quantile axis storing ABSOLUTE speed
           (6 gathers: radius 2 + joint bilinear 4; no psi lookup at all)
       v2: v1 + stochastic row selection (4 gathers)
       v3: v2 with rows packed (k, m..m+1) as one row-of-2 gather if A
           says rows are cheap (2-3 gathers)
  C. gas mixing: separate dens/eint lerps (8 gathers/particle for 2
     halos) vs packed (n_grid, 2) row gathers (4) at 5e6 particles.
"""

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
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(jnp.ravel(l)[-2:].astype(jnp.float32))
                     for l in leaves))


def timed(name, fn, *args, n=3):
    t0 = time.time()
    force(fn(*args))
    log(f"{name}: compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"{name}: warm {med*1e3:.1f} ms  (all: {[f'{t*1e3:.0f}' for t in ts]})")
    return med


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.key(0)
    N = 30_000_000

    # ---------------------------------------------------------------- A
    log("== A. gather microbenchmarks ==")
    idx = jax.random.randint(jax.random.key(1), (N,), 0, 2046)
    tab1 = jnp.asarray(np.random.rand(2048).astype(np.float32))
    tab2 = jnp.asarray(np.random.rand(2048, 2).astype(np.float32))
    tab4 = jnp.asarray(np.random.rand(2048, 4).astype(np.float32))
    tab1b = tab1.astype(jnp.bfloat16)
    big2d = jnp.asarray(np.random.rand(2048, 512).astype(np.float32))
    m_idx = jax.random.randint(jax.random.key(2), (N,), 0, 510)

    timed("A1 scalar gather x1", jax.jit(lambda t, i: t[i]), tab1, idx)
    timed("A1b scalar gather x2 (two tables)",
          jax.jit(lambda t, i: t[i] + t[i + 1]), tab1, idx)
    timed("A2 row-of-2 gather", jax.jit(lambda t, i: t[i].sum(-1)),
          tab2, idx)
    timed("A3 row-of-4 gather", jax.jit(lambda t, i: t[i].sum(-1)),
          tab4, idx)
    timed("A4 bf16 scalar gather", jax.jit(lambda t, i: t[i]), tab1b, idx)
    timed("A5 2D scalar gather (k,m)",
          jax.jit(lambda t, i, m: t[i, m]), big2d, idx, m_idx)
    timed("A6 2D bilinear (4 gathers)",
          jax.jit(lambda t, i, m: (t[i, m] + t[i, m + 1] + t[i + 1, m]
                                   + t[i + 1, m + 1])), big2d, idx, m_idx)
    timed("A7 2D row-pair gather (t[i, m:m+2] via take)",
          jax.jit(lambda t, i, m: (
              jnp.take_along_axis(t[i], jnp.stack([m, m + 1], -1), axis=-1)
              .sum(-1))), big2d, idx, m_idx)

    # ---------------------------------------------------------------- B
    log("== B. collisionless draw variants (4e6 particles) ==")
    from cluster_generator_tpu.pipeline import (
        _sample_collisionless,
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
    )

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    rmax = jnp.asarray([5000.0, 5000.0])
    fields = build_merger_models(M200, conc)
    tables = build_speed_tables(fields)
    rtab = build_radius_tables(fields, rmax)
    f0 = jax.tree_util.tree_map(lambda a: a[0], fields)
    s_inv = tables["dm"][0]
    r_q = rtab["dm"][0]
    m_rmax = rtab["dm_mtot"][0]
    Np = 4_000_000
    center = jnp.zeros(3)
    bulk = jnp.zeros(3)

    v0 = jax.jit(lambda k: _sample_collisionless(
        k, f0, s_inv, r_q, m_rmax, Np, center, bulk, jnp.float32)[1])
    timed("B v0 current (8 gathers)", v0, key)

    # joint table: rows = radius quantiles, cols = speed quantiles,
    # values = ABSOLUTE speed (kpc/Myr)
    def build_joint(f_h, s_inv, r_q):
        rr = f_h["radius"]
        psi_r = (-f_h["gravitational_potential"]).astype(jnp.float32)
        n = rr.shape[0]
        logr0 = jnp.log(rr[0]).astype(jnp.float32)
        dlog = ((jnp.log(rr[-1]) - jnp.log(rr[0])) / (n - 1)).astype(jnp.float32)
        x = jnp.clip((jnp.log(r_q) - logr0) / dlog, 0.0, n - 1 - 1e-6)
        j = x.astype(jnp.int32)
        w = x - j
        psi_q = (1 - w) * psi_r[j] + w * psi_r[j + 1]          # (RQ,)
        n_grid, n_q = s_inv.shape
        k_row = jnp.clip(n_grid - 2 - j, 0, n_grid - 2)
        wk = (1.0 - w)[:, None]
        sd = s_inv.astype(jnp.float32)
        srow = (1 - wk) * sd[k_row] + wk * sd[k_row + 1]       # (RQ, n_q)
        return srow * jnp.sqrt(2.0 * psi_q)[:, None]           # speeds

    joint = jax.jit(build_joint)(f0, s_inv, r_q)
    log(f"joint table shape {joint.shape} dtype {joint.dtype}")

    def v1(k):
        kr, kv = jax.random.split(k)
        u = jax.random.uniform(kr, (Np,), dtype=jnp.float32)
        RQ = r_q.shape[0]
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        kq = x.astype(jnp.int32)
        wq = x - kq
        radius = (1 - wq) * r_q[kq] + wq * r_q[kq + 1]
        n_q = joint.shape[1]
        uq = jax.random.uniform(kv, (Np,), dtype=jnp.float32)
        qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
        m = qm.astype(jnp.int32)
        wm = qm - m
        sp = ((1 - wq) * ((1 - wm) * joint[kq, m] + wm * joint[kq, m + 1])
              + wq * ((1 - wm) * joint[kq + 1, m] + wm * joint[kq + 1, m + 1]))
        return radius, sp

    timed("B v1 joint bilinear (6 gathers)", jax.jit(v1), key)

    def v2(k):
        kr, kv, kb = jax.random.split(k, 3)
        u = jax.random.uniform(kr, (Np,), dtype=jnp.float32)
        RQ = r_q.shape[0]
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        kq = x.astype(jnp.int32)
        wq = x - kq
        radius = (1 - wq) * r_q[kq] + wq * r_q[kq + 1]
        # stochastic row: unbiased in expectation, O(drow) distribution err
        bern = jax.random.uniform(kb, (Np,), dtype=jnp.float32) < wq
        krow = kq + bern.astype(jnp.int32)
        n_q = joint.shape[1]
        uq = jax.random.uniform(kv, (Np,), dtype=jnp.float32)
        qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
        m = qm.astype(jnp.int32)
        wm = qm - m
        sp = (1 - wm) * joint[krow, m] + wm * joint[krow, m + 1]
        return radius, sp

    timed("B v2 stochastic row (4 gathers)", jax.jit(v2), key)

    def v3(k):
        kr, kv, kb = jax.random.split(k, 3)
        u = jax.random.uniform(kr, (Np,), dtype=jnp.float32)
        RQ = r_q.shape[0]
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        kq = x.astype(jnp.int32)
        wq = x - kq
        radius = (1 - wq) * r_q[kq] + wq * r_q[kq + 1]
        bern = jax.random.uniform(kb, (Np,), dtype=jnp.float32) < wq
        krow = kq + bern.astype(jnp.int32)
        n_q = joint.shape[1]
        uq = jax.random.uniform(kv, (Np,), dtype=jnp.float32)
        qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
        m = qm.astype(jnp.int32)
        wm = qm - m
        rows = joint[krow]                       # (Np, n_q) slice-gather
        pair = jnp.take_along_axis(
            rows, jnp.stack([m, m + 1], axis=-1), axis=-1)
        sp = (1 - wm) * pair[..., 0] + wm * pair[..., 1]
        return radius, sp

    timed("B v3 row + take_along (row gather)", jax.jit(v3), key)

    # ---------------------------------------------------------------- C
    log("== C. gas mixing variants (5e6 particles, 2 halos) ==")
    from cluster_generator_tpu.pipeline import _mix_gas, _sample_gas_halo

    Ng = 5_000_000
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    pos, _ = jax.jit(lambda k: _sample_gas_halo(
        k, f0, rtab["gas"][0], rtab["gas_mtot"][0], Ng, centers[0],
        jnp.float32))(key)

    c0 = jax.jit(lambda p: _mix_gas(p, fields, centers, vels, jnp.float32))
    timed("C v0 current mix (8 gathers)", c0, pos)

    # packed: per halo a (n_grid, 2) table [dens, dens*eint]
    dens_t = fields["density"].astype(jnp.float32)
    e_t = (1.5 * fields["pressure"] / fields["density"]).astype(jnp.float32)
    packed = jnp.stack([dens_t, dens_t * e_t], axis=-1)  # (H, n, 2)

    def mix_packed(p):
        H = centers.shape[0]
        rr = fields["radius"]
        out_d = 0.0
        out_e = 0.0
        mom = 0.0
        for i in range(H):
            r = jnp.sqrt(((p - centers[i].astype(jnp.float32)) ** 2).sum(1))
            n = rr.shape[1]
            logr0 = jnp.log(rr[i, 0]).astype(jnp.float32)
            dlog = ((jnp.log(rr[i, -1]) - jnp.log(rr[i, 0])) / (n - 1)).astype(jnp.float32)
            x = jnp.clip((jnp.log(r) - logr0) / dlog, 0.0, n - 1 - 1e-6)
            j = x.astype(jnp.int32)
            w = (x - j)[:, None]
            de = (1 - w) * packed[i, j] + w * packed[i, j + 1]  # (Np, 2)
            out_d = out_d + de[:, 0]
            out_e = out_e + de[:, 1]
            mom = mom + vels[i].astype(jnp.float32)[None, :] * de[:, 0:1]
        return out_d, out_e / out_d, mom / out_d[:, None]

    timed("C v1 packed rows (4 row-gathers)", jax.jit(mix_packed), pos)

    log("DONE")


if __name__ == "__main__":
    main()
