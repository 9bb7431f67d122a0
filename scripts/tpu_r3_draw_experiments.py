#!/usr/bin/env python
"""Round-3 TPU experiments: settling the collisionless-draw floor
(VERDICT r2 Next #5 and stretch #9).

The production draw (pipeline._sample_collisionless) costs TWO row-of-2
gathers per particle: radius from the (RQ-1, 2) quantile-pair table, speed
from the (RQ*(n_q-1), 2) joint absolute-speed table.  Candidates:

  E1 baseline       current two-gather draw, production shapes
                    (RQ=2048, n_q=512, N=1e7)
  E2 fused row-of-6 ONE gather per particle from a combined
                    (RQ-1)*(n_q-1) x 6 table
                    [r_lo, r_hi, s_k_lo, s_k_hi, s_k1_lo, s_k1_hi]:
                    radius pair AND both candidate speed rows in one row,
                    bernoulli row choice applied by jnp.where afterward —
                    *exactly* the same distribution as E1.
  E3 sorted         E1 with draws radius-sorted before the gathers
                    (gather locality) and inverse-permuted after — the
                    experiment round-1/2 never ran.
  E4 width scan     row-of-2/4/8 gather rate from an E2-sized (~25-50 MB)
                    table — is row width free once a row is fetched?
  E5 one-hot MXU    speed row-select as a (N, RQ) one-hot x (RQ, n_q)
                    bf16 matmul at N=1e6 (extrapolate): Mosaic has no
                    per-lane gather, but the MXU can "gather" by matmul.

Run: nohup python scripts/tpu_r3_draw_experiments.py > /tmp/draws3.log 2>&1 &
"""

import os
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
    log(f"{name:34s} compile+1st {c:7.2f}s   warm {med*1e3:8.2f} ms")
    return med


def main():
    from cluster_generator_tpu.pipeline import (
        _RQ,
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        _sample_collisionless,
    )
    from cluster_generator_tpu.core.interp import adjacent_pairs

    N = 100_000 if os.environ.get("SMOKE") else 10_000_000
    dtype = jnp.float32
    fields = build_merger_models(jnp.asarray([1.5e15]), jnp.asarray([4.0]),
                                 num_points=1000)
    f_h = jax.tree_util.tree_map(lambda a: a[0], fields)
    tables = build_speed_tables(fields)
    rt = build_radius_tables(fields, jnp.asarray([3000.0]))
    rq1, m1 = rt["dm"][0], rt["dm_mtot"][0]
    s_inv = tables["dm"][0]
    n_q = s_inv.shape[1]
    log(f"shapes: RQ={_RQ} n_q={n_q} s_inv={s_inv.shape} N={N}")

    center = jnp.zeros(3)
    bulk = jnp.zeros(3)

    # ------------------------------------------------ E1 baseline
    @jax.jit
    def e1(key):
        pos, vel, pm = _sample_collisionless(key, f_h, s_inv, rq1, m1, N,
                                             center, bulk, dtype)
        return pos[:, 0] + vel[:, 0]

    t1 = timed("E1 baseline two-gather", e1, jax.random.key(0))

    # ------------------------------------------------ E2 fused row-of-6
    from cluster_generator_tpu.pipeline import _build_joint_speed_pairs

    def build_combined(f_h, s_inv, rq):
        jp = _build_joint_speed_pairs(f_h, s_inv, rq, dtype)  # (RQ*(nq-1),2)
        RQ = rq.shape[0]
        jp = jp.reshape(RQ, n_q - 1, 2)
        rp = adjacent_pairs(rq)                               # (RQ-1, 2)
        rows = jnp.concatenate([
            jnp.broadcast_to(rp[:, None, :], (RQ - 1, n_q - 1, 2)),
            jp[:-1],                                          # row k
            jp[1:],                                           # row k+1
        ], axis=-1)                                           # (RQ-1,nq-1,6)
        return rows.reshape(-1, 6)

    comb = jax.jit(build_combined)(f_h, s_inv, rq1)
    comb.block_until_ready()
    log(f"combined table: {comb.shape} = "
        f"{comb.size * 4 / 1e6:.1f} MB")

    @jax.jit
    def e2(key):
        kr, kv, kb, ka, kva = jax.random.split(key, 5)
        RQ = rq1.shape[0]
        u = jax.random.uniform(kr, (N,), dtype=dtype)
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        kq = x.astype(jnp.int32)
        wq = x - kq.astype(dtype)
        uq = jax.random.uniform(kv, (N,), dtype=dtype)
        qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
        m = qm.astype(jnp.int32)
        wm = qm - m.astype(dtype)
        row = comb[kq * (n_q - 1) + m]                        # ONE gather
        radius = (1.0 - wq) * row[:, 0] + wq * row[:, 1]
        bern = jax.random.uniform(kb, (N,), dtype=dtype) < wq
        s_lo = jnp.where(bern, row[:, 4], row[:, 2])
        s_hi = jnp.where(bern, row[:, 5], row[:, 3])
        speed = (1.0 - wm) * s_lo + wm * s_hi
        from cluster_generator_tpu.pipeline import _isotropic
        pos = radius[:, None] * _isotropic(ka, N, dtype)
        vel = speed[:, None] * _isotropic(kva, N, dtype)
        return pos[:, 0] + vel[:, 0]

    t2 = timed("E2 fused row-of-6 one-gather", e2, jax.random.key(0))

    # sanity: same marginals as E1 (KS on radius/speed at 2e5)
    NS = 20_000 if os.environ.get("SMOKE") else 200_000
    p1 = np.asarray(jax.jit(lambda k: _sample_collisionless(
        k, f_h, s_inv, rq1, m1, NS, center, bulk, dtype)[0])(
            jax.random.key(5)))
    r1 = np.linalg.norm(p1, axis=1)
    # E2 radius marginal via the same uniforms-independent check
    from scipy.stats import ks_2samp
    # draw E2 at 2e5 by re-running its radius math on host
    k = jax.random.key(9)
    kr, kv, kb, ka, kva = jax.random.split(k, 5)
    u = np.asarray(jax.random.uniform(kr, (NS,), dtype=dtype))
    x = np.clip(u * (_RQ - 1), 0.0, _RQ - 1 - 1e-6)
    kqh = x.astype(np.int32)
    wqh = x - kqh
    ch = np.asarray(comb)
    # radius uses columns 0/1 at any m; pick m=0
    rowh = ch[kqh * (n_q - 1)]
    r2 = (1.0 - wqh) * rowh[:, 0] + wqh * rowh[:, 1]
    stat, pval = ks_2samp(r1, r2)
    log(f"E2 radius-marginal KS vs E1: D={stat:.4f} p={pval:.3f}")

    # ------------------------------------------------ E3 radius-sorted E1
    @jax.jit
    def e3(key):
        kr, kv, kb, ka, kva = jax.random.split(key, 5)
        RQ = rq1.shape[0]
        u = jax.random.uniform(kr, (N,), dtype=dtype)
        u = jnp.sort(u)                       # radius-sorted draw order
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
        kq = x.astype(jnp.int32)
        wq = x - kq.astype(dtype)
        rp = adjacent_pairs(rq1)[kq]
        radius = (1.0 - wq) * rp[:, 0] + wq * rp[:, 1]
        uq = jax.random.uniform(kv, (N,), dtype=dtype)
        qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
        m = qm.astype(jnp.int32)
        wm = qm - m.astype(dtype)
        bern = jax.random.uniform(kb, (N,), dtype=dtype) < wq
        k_row = kq + bern.astype(jnp.int32)
        jp = _build_joint_speed_pairs(f_h, s_inv, rq1, dtype)
        sp = jp[k_row * (n_q - 1) + m]
        speed = (1.0 - wm) * sp[:, 0] + wm * sp[:, 1]
        from cluster_generator_tpu.pipeline import _isotropic
        pos = radius[:, None] * _isotropic(ka, N, dtype)
        vel = speed[:, None] * _isotropic(kva, N, dtype)
        return pos[:, 0] + vel[:, 0]

    t3 = timed("E3 radius-sorted (incl. sort)", e3, jax.random.key(0))

    # sort cost alone, for attribution
    @jax.jit
    def sort_only(key):
        u = jax.random.uniform(jax.random.split(key)[0], (N,), dtype=dtype)
        return jnp.sort(u)

    ts = timed("E3b sort-only cost", sort_only, jax.random.key(0))

    # ------------------------------------------------ E4 row-width scan
    M = comb.shape[0]
    key = jax.random.key(1)
    idx = jax.random.randint(key, (N,), 0, M - 1)
    for width, tab in (
        (2, comb[:, :2]),
        (4, comb[:, :4]),
        (8, jnp.concatenate([comb, comb[:, :2]], axis=1)),
    ):
        tab = jnp.array(tab)

        @jax.jit
        def gw(i, tab=tab):
            return jnp.sum(tab[i], axis=1)

        timed(f"E4 row-of-{width} gather ({tab.size*4/1e6:.0f} MB)", gw, idx)

    # ------------------------------------------------ E5 one-hot MXU
    N5 = 50_000 if os.environ.get("SMOKE") else 1_000_000
    RQ5 = 256  # row-select against the 256-row speed subgrid
    tab5 = jnp.asarray(
        np.random.default_rng(0).random((RQ5, n_q), dtype=np.float32))
    idx5 = jax.random.randint(jax.random.key(2), (N5,), 0, RQ5)

    @jax.jit
    def onehot_matmul(i):
        oh = jax.nn.one_hot(i, RQ5, dtype=jnp.bfloat16)
        rows = oh @ tab5.astype(jnp.bfloat16)        # (N5, n_q)
        return jnp.sum(rows, axis=1)

    t5 = timed(f"E5 one-hot matmul N={N5} RQ={RQ5}", onehot_matmul, idx5)
    log(f"E5 extrapolated to 1e7: {t5 * 10 * 1e3:.1f} ms "
        f"(flops {N5 * RQ5 * n_q * 2 / t5 / 1e12:.1f} Tf/s)")

    log("SUMMARY "
        f"E1={t1*1e3:.1f}ms E2={t2*1e3:.1f}ms E3={t3*1e3:.1f}ms "
        f"(sort {ts*1e3:.1f}ms)")


if __name__ == "__main__":
    main()
