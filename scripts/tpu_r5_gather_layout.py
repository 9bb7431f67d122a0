#!/usr/bin/env python
"""Gather-layout experiment for the draw tables (round-5).

The cfg5d compile OOM'd: the row-of-4 radius/v_esc gather materializes a
``f32[B*N, 4]`` temp that the TPU T(8,128) tile layout pads 32x (15.26 G
for 3.2e7 draws — r5_cfg5d.log).  The row-of-2 joint speed gather pads
64x the same way when materialized.  Candidate fix: gather along the
MINOR axis from a transposed ``[4, rows]`` table — the padded output is
``[4 -> 8, N -> mult-of-128]``, a 2x expansion — IF the per-lane gather
cost doesn't regress (the r4 experiments measured CONTIGUOUS row
gathers 2.7x cheaper than scalar gathers; a transposed gather is a
different access pattern).

Measures, vmapped over a 16-cluster batch at 5e5 draws/cluster (the
cfg5d shape):
  A: row-of-4 gather  [N, 4]   (current product code)
  B: transposed       [4, N]   (candidate)
  C: 4 scalar gathers          (baseline)
and the row-of-2 joint speed gather the same way, with checksum
equality across variants.
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

B, N, RQ, NQ = 16, 500_000, 2048, 512


def bench(name, fn, *args):
    out = fn(*args)
    chk = float(jnp.sum(out[:, ::4096]))
    times = []
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(fn(*args)[:, ::4096]))
        times.append(time.time() - t0)
    w = sorted(times)[1]
    print(f"# {name}: warm {w * 1e3:.1f} ms checksum {chk:.6g}",
          flush=True)
    return chk, w


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    key = jax.random.key(0)
    tab4 = jax.random.normal(key, (B, RQ - 1, 4), jnp.float32)
    kq = jax.random.randint(jax.random.fold_in(key, 1), (B, N), 0, RQ - 1)
    wq = jax.random.uniform(jax.random.fold_in(key, 2), (B, N),
                            jnp.float32)

    @jax.jit
    def a_row4(tab4, kq, wq):
        def one(t, k, w):
            row = t[k]
            return ((1 - w) * row[:, 0] + w * row[:, 1]
                    + (1 - w) * row[:, 2] + w * row[:, 3])
        return jax.vmap(one)(tab4, kq, wq)

    @jax.jit
    def b_transposed(tab4, kq, wq):
        def one(t, k, w):
            tt = t.T  # (4, RQ-1)
            c = tt[:, k]  # (4, N)
            return ((1 - w) * c[0] + w * c[1] + (1 - w) * c[2] + w * c[3])
        return jax.vmap(one)(tab4, kq, wq)

    @jax.jit
    def c_scalar(tab4, kq, wq):
        def one(t, k, w):
            return ((1 - w) * t[k, 0] + w * t[k, 1]
                    + (1 - w) * t[k, 2] + w * t[k, 3])
        return jax.vmap(one)(tab4, kq, wq)

    cks = [bench("A row-of-4 [N,4]", a_row4, tab4, kq, wq)[0],
           bench("B transposed [4,N]", b_transposed, tab4, kq, wq)[0],
           bench("C 4 scalar gathers", c_scalar, tab4, kq, wq)[0]]
    assert all(abs(c - cks[0]) < 1e-3 * abs(cks[0]) for c in cks), cks

    # row-of-2 joint speed table, flattened (RQ-1)*(NQ-1) rows
    jtab = jax.random.normal(jax.random.fold_in(key, 3),
                             (B, (RQ - 1) * (NQ - 1), 2), jnp.float32)
    m = jax.random.randint(jax.random.fold_in(key, 4), (B, N), 0, NQ - 1)
    idx = kq * (NQ - 1) + m

    @jax.jit
    def a2_row2(jtab, idx, wq):
        def one(t, i, w):
            sp = t[i]
            return (1 - w) * sp[:, 0] + w * sp[:, 1]
        return jax.vmap(one)(jtab, idx, wq)

    @jax.jit
    def b2_transposed(jtab, idx, wq):
        def one(t, i, w):
            tt = t.T
            c = tt[:, i]
            return (1 - w) * c[0] + w * c[1]
        return jax.vmap(one)(jtab, idx, wq)

    cks2 = [bench("A2 row-of-2 [N,2]", a2_row2, jtab, idx, wq)[0],
            bench("B2 transposed [2,N]", b2_transposed, jtab, idx, wq)[0]]
    assert abs(cks2[1] - cks2[0]) < 1e-3 * abs(cks2[0]), cks2

    try:
        ms = jax.local_devices()[0].memory_stats()
        print(f"# HBM peak: {ms.get('peak_bytes_in_use', 0) / 1e9:.2f} GB",
              flush=True)
    except Exception as e:
        print(f"# HBM stats unavailable: {e}", flush=True)
    print("# GATHER_LAYOUT DONE")


if __name__ == "__main__":
    main()
