#!/usr/bin/env python
"""Sub-stage timing INSIDE speed_inverse_cdf_table (cumulative jits).

After compare-matrix bracketing (r4_batch5.log) the datagen batch's
remaining table cost is the speed-table builder itself (~1.55 s of the
1024-cluster batch, r4_cfg5b_stages.log P1-P0).  Split it:

  T0: build+DF + spline + uniform-node evals (fu)
  T1: T0 + the (rows x n_s) f(E) lerp block (f_E)
  T2: T1 + pdf + row cumsum + normalization (cdf)
  T3: T1 + full table (adds the masked inversion)   [= P1]

All stages replicate the EXACT production code path (virial.py
speed_inverse_cdf_table internals at table_dtype=f32) over 1024 clusters
in batches of 256; outputs are fully summed so XLA cannot DCE a stage.
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

    from cluster_generator_tpu.core.interp import (
        adjacent_pairs,
        cubic_spline,
        spline_eval_uniform,
    )
    from cluster_generator_tpu.core.scan_ops import cumsum
    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster
    from cluster_generator_tpu.virial import (
        _invert_cdf_masked,
        speed_inverse_cdf_table,
        speed_table_defaults,
    )

    n_cl, n_batch, n_pts, n_rows = 1024, 256, 512, 256
    kw = speed_table_defaults()
    n_s, n_q = kw["n_s"], kw["n_q"]
    NF1, NF2 = kw["nf1"], kw["nf2"]
    tdt = kw["table_dtype"]
    row_idx = np.unique(np.round(
        np.linspace(0, n_pts - 1, n_rows)).astype(int))
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    def prelude(m, cc):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        f_vals = f["dm_df"][::-1]
        row_ee = ee[row_idx]
        f_sp = cubic_spline(ee, f_vals)
        fmax = jnp.max(jnp.abs(f_vals))
        e_max = jnp.max(row_ee)
        b = 0.9 * e_max
        step1 = b / NF1
        step2 = (e_max - b) / (NF2 - 1)
        fu = jnp.concatenate([
            spline_eval_uniform(f_sp, jnp.zeros_like(b), step1, NF1),
            spline_eval_uniform(f_sp, b, step2, NF2)])
        fu = jnp.maximum(fu / fmax, 0.0)
        return row_ee, fu, b, e_max

    def fe_block(row_ee, fu, b, e_max):
        s = jnp.linspace(0.0, 1.0, n_s).astype(tdt)
        E = (row_ee[:, None] * (1.0 - s[None, :] ** 2)).astype(tdt)
        f_pairs = adjacent_pairs(fu.astype(tdt))
        Ef = E.reshape(-1)
        bt = b.astype(tdt)
        x1 = jnp.clip(Ef / bt * NF1, 0.0, NF1 - 1e-4)
        k1 = jnp.minimum(x1.astype(jnp.int32), NF1 - 1)
        w1 = x1 - k1.astype(tdt)
        x2 = jnp.clip((Ef - bt) / (e_max.astype(tdt) - bt)
                      * (NF2 - 1), 0.0, NF2 - 1 - 1e-4)
        k2 = jnp.minimum(x2.astype(jnp.int32), NF2 - 2)
        w2 = x2 - k2.astype(tdt)
        in1 = Ef < bt
        k = jnp.where(in1, k1, NF1 + k2)
        w = jnp.where(in1, w1, w2)
        fp = f_pairs[k]
        f_E = ((1.0 - w) * fp[:, 0] + w * fp[:, 1]).reshape(E.shape)
        return s, f_E

    def t0_fn(m, cc):
        row_ee, fu, b, e_max = prelude(m, cc)
        return jnp.sum(fu) + jnp.sum(row_ee)

    def t1_fn(m, cc):
        row_ee, fu, b, e_max = prelude(m, cc)
        s, f_E = fe_block(row_ee, fu, b, e_max)
        return jnp.sum(f_E)

    def t2_fn(m, cc):
        row_ee, fu, b, e_max = prelude(m, cc)
        s, f_E = fe_block(row_ee, fu, b, e_max)
        pdf = s[None, :] ** 2 * f_E
        pdf = pdf / jnp.maximum(jnp.max(pdf, axis=1, keepdims=True),
                                jnp.asarray(1e-30, tdt))
        ds = s[1] - s[0]
        cdf = jnp.concatenate(
            [jnp.zeros((pdf.shape[0], 1), pdf.dtype),
             cumsum(0.5 * (pdf[:, 1:] + pdf[:, :-1]) * ds, axis=1)], axis=1)
        total = cdf[:, -1:]
        cdf = cdf / jnp.where(total > 0.0, total, 1.0)
        return jnp.sum(cdf)

    def t3_fn(m, cc):
        f = build_one_cluster(m, cc, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        tab = speed_inverse_cdf_table(ee, f["dm_df"][::-1],
                                      row_ee=ee[row_idx], **kw)
        return jnp.sum(tab)

    for tag, one in [("T0-nodes", t0_fn), ("T1-+feblock", t1_fn),
                     ("T2-+cumsum", t2_fn), ("T3-full", t3_fn)]:
        @jax.jit
        def batch(M200, conc, one=one):
            return jnp.sum(jax.vmap(one)(M200, conc))

        def once(i):
            tot = 0.0
            for b0 in range(0, n_cl, n_batch):
                tot += float(batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                   c[b0:b0 + n_batch]))
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

    print("TABLE STAGES DONE", flush=True)


if __name__ == "__main__":
    main()
