#!/usr/bin/env python
"""Round-2 TPU experiments, part 2: row-gather table designs.

Part-1 results (tpu_gather_experiments.py, N=3e7 warm):
  A1 scalar 1D gather           253 ms   (~118M/s)
  A1b two scalar gathers        478 ms   (linear)
  A2 row-of-2 1D gather          93 ms   (2.7x faster AND fetches 2)
  A3 row-of-4 1D gather          93 ms
  A4 bf16 scalar                283 ms   (no win)
  A5 2D (k,m) scalar gather     343 ms   (2D indexing costs +35%)
  A6 2D bilinear (4 gathers)   1288 ms
  A7 take_along_axis            OOM (materializes (N,2,2) s32 indices)

=> the recipe is: flatten every table to 1D rows and fetch PAIRS.

This part measures, at production shapes:
  A8  row-of-2 gather from a 1M-row (8 MB) table — cache sensitivity
  B   collisionless draw variants at 4e6 particles
  C   gas mixing at 5e6 particles: current vs packed row-of-4
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

    # ---------------------------------------------------------------- A8
    if not os.environ.get("SKIP_A8"):
        log("== A8: row-of-2 gather vs table size ==")
        N = 30_000_000
        for rows in (2048, 1_048_576):
            tab = jnp.asarray(np.random.rand(rows, 2).astype(np.float32))
            idx = jax.random.randint(jax.random.key(1), (N,), 0, rows - 1)
            timed(f"A8 rows={rows}", jax.jit(lambda t, i: t[i].sum(-1)),
                  tab, idx)

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
    r_q = rtab["dm"][0].astype(jnp.float32)
    m_rmax = rtab["dm_mtot"][0]
    Np = 4_000_000
    center = jnp.zeros(3)
    bulk = jnp.zeros(3)

    v0 = jax.jit(lambda k: _sample_collisionless(
        k, f0, s_inv, r_q, m_rmax, Np, center, bulk, jnp.float32)[1])
    timed("B v0 current (8 scalar gathers)", v0, key)

    # --- joint ABSOLUTE-speed table on the radius-quantile axis
    def build_joint(f_h, s_inv, r_q):
        rr = f_h["radius"]
        psi_r = (-f_h["gravitational_potential"]).astype(jnp.float32)
        n = rr.shape[0]
        logr0 = jnp.log(rr[0]).astype(jnp.float32)
        dlog = ((jnp.log(rr[-1]) - jnp.log(rr[0])) / (n - 1)).astype(
            jnp.float32)
        x = jnp.clip((jnp.log(r_q) - logr0) / dlog, 0.0, n - 1 - 1e-6)
        j = x.astype(jnp.int32)
        w = x - j
        psi_q = (1 - w) * psi_r[j] + w * psi_r[j + 1]
        n_grid, n_q = s_inv.shape
        k_row = jnp.clip(n_grid - 2 - j, 0, n_grid - 2)
        wk = (1.0 - w)[:, None]
        sd = s_inv.astype(jnp.float32)
        srow = (1 - wk) * sd[k_row] + wk * sd[k_row + 1]
        return srow * jnp.sqrt(2.0 * psi_q)[:, None]  # (RQ, n_q) speeds

    joint = jax.jit(build_joint)(f0, s_inv, r_q)
    RQ, n_q = joint.shape
    # paired tables for row gathers
    r_pair = jnp.stack([r_q[:-1], r_q[1:]], axis=-1)          # (RQ-1, 2)
    j_pair = jnp.stack([joint[:, :-1], joint[:, 1:]],
                       axis=-1).reshape(RQ * (n_q - 1), 2)    # rows (k, m)

    def draw_u(k):
        kr, kv, kb = jax.random.split(k, 3)
        u = jax.random.uniform(kr, (Np,), dtype=jnp.float32)
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        kq = x.astype(jnp.int32)
        wq = x - kq
        uq = jax.random.uniform(kv, (Np,), dtype=jnp.float32)
        qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
        m = qm.astype(jnp.int32)
        wm = qm - m
        return kq, wq, m, wm, kb

    def v4(k):
        """2 row gathers: radius pair + stochastic-row speed pair."""
        kq, wq, m, wm, kb = draw_u(k)
        rp = r_pair[kq]
        radius = (1 - wq) * rp[:, 0] + wq * rp[:, 1]
        bern = jax.random.uniform(kb, (Np,), dtype=jnp.float32) < wq
        krow = kq + bern.astype(jnp.int32)
        sp_pair = j_pair[krow * (n_q - 1) + m]
        sp = (1 - wm) * sp_pair[:, 0] + wm * sp_pair[:, 1]
        return radius, sp

    timed("B v4 row gathers + stochastic row (2 row gathers)",
          jax.jit(v4), key)

    def v5(k):
        """3 row gathers: radius pair + deterministic bilinear."""
        kq, wq, m, wm, _ = draw_u(k)
        rp = r_pair[kq]
        radius = (1 - wq) * rp[:, 0] + wq * rp[:, 1]
        flat = kq * (n_q - 1) + m
        p0 = j_pair[flat]
        p1 = j_pair[flat + (n_q - 1)]
        sp = ((1 - wq) * ((1 - wm) * p0[:, 0] + wm * p0[:, 1])
              + wq * ((1 - wm) * p1[:, 0] + wm * p1[:, 1]))
        return radius, sp

    timed("B v5 row gathers bilinear (3 row gathers)", jax.jit(v5), key)

    # ---------------------------------------------------------------- C
    log("== C. gas mixing (5e6 particles, 2 halos) ==")
    from cluster_generator_tpu.pipeline import _mix_gas, _sample_gas_halo

    Ng = 5_000_000
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    pos, _ = jax.jit(lambda k: _sample_gas_halo(
        k, f0, rtab["gas"][0], rtab["gas_mtot"][0], Ng, centers[0],
        jnp.float32))(key)

    c0 = jax.jit(lambda p: _mix_gas(p, fields, centers, vels, jnp.float32))
    timed("C v0 current mix (8 scalar gathers)", c0, pos)

    dens_t = fields["density"].astype(jnp.float32)
    e_t = (1.5 * fields["pressure"] / fields["density"]).astype(jnp.float32)
    # packed rows: [dens_j, (dens*e)_j, dens_j+1, (dens*e)_j+1]  (H, n-1, 4)
    de = jnp.stack([dens_t, dens_t * e_t], axis=-1)  # (H, n, 2)
    packed4 = jnp.concatenate([de[:, :-1], de[:, 1:]], axis=-1)

    def mix_packed4(p):
        H = centers.shape[0]
        rr = fields["radius"]
        out_d = 0.0
        out_e = 0.0
        mom = 0.0
        for i in range(H):
            r = jnp.sqrt(((p - centers[i].astype(jnp.float32)) ** 2).sum(1))
            n = rr.shape[1]
            logr0 = jnp.log(rr[i, 0]).astype(jnp.float32)
            dlog = ((jnp.log(rr[i, -1]) - jnp.log(rr[i, 0]))
                    / (n - 1)).astype(jnp.float32)
            x = jnp.clip((jnp.log(r) - logr0) / dlog, 0.0, n - 1 - 1e-6)
            j = x.astype(jnp.int32)
            w = x - j
            rowq = packed4[i, j]  # (Np, 4): one row-of-4 gather
            d_i = (1 - w) * rowq[:, 0] + w * rowq[:, 2]
            e_i = (1 - w) * rowq[:, 1] + w * rowq[:, 3]
            out_d = out_d + d_i
            out_e = out_e + e_i
            mom = mom + vels[i].astype(jnp.float32)[None, :] * d_i[:, None]
        return out_d, out_e / out_d, mom / out_d[:, None]

    timed("C v1 packed row-of-4 (2 row gathers)", jax.jit(mix_packed4), pos)

    log("DONE")


if __name__ == "__main__":
    main()
