#!/usr/bin/env python
"""cfg6 measure-first pass (VERDICT r5 item 5): per-stage attribution of
the merger-scene batch program — run AND cold-compile — via cumulative
jitted programs over the cfg6 workload (256 scenes x 1e5 particles,
batches of 64):

  S0: 2 equilibrium models + DM/star Eddington DFs per scene
  S1: S0 + speed tables (dm + star)
  S2: S1 + radius quantile tables
  S3: S2 + collisionless draws (dm + star; n_gas = 0)
  S4: S3 + gas draws + density-weighted mixing  (= the full cfg6 scene)

Consecutive differences attribute each stage.  The compilation cache is
pointed at a THROWAWAY dir so the first-call times are honest cold
compiles (the 230.6 s cfg6 cold compile was the largest in the repo and
unattributed, VERDICT r4 weak #4).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/r5_stage_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    from cluster_generator_tpu.parallel.mergers import (
        binary_scene_geometry,
        sample_merger_scene_params,
    )
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic,
    )

    n_sc, n_batch, n_pts = 256, 64, 512
    n_dm, n_gas, n_star = (25_000, 25_000), (20_000, 20_000), (5_000, 5_000)
    r_max = jnp.asarray([5000.0, 5000.0], jnp.float64)

    p = sample_merger_scene_params(jax.random.key(7), n_sc)
    ctr, vel = binary_scene_geometry(p["M200"], p["d"], p["b"], p["v_rel"])
    ctr, vel = jnp.asarray(ctr), jnp.asarray(vel)

    def make(stage):
        def one(m, c, ct, vl, k):
            f = build_merger_models.__wrapped__(m, c, num_points=n_pts)
            acc = jnp.sum(f["dm_df"]) + jnp.sum(f["star_df"])
            if stage >= 1:
                t = build_speed_tables.__wrapped__(f)
                acc += jnp.sum(t["dm"]) + jnp.sum(t["star"])
            if stage >= 2:
                rt = build_radius_tables.__wrapped__(f, r_max)
                acc += sum(jnp.sum(v) for v in rt.values())
            if stage >= 3:
                t = dict(t)
                t["radius"] = rt
                ng = (0, 0) if stage == 3 else n_gas
                parts = sample_merger_ic.__wrapped__(
                    f, t, ct, vl, r_max, k, ng, n_dm, n_star)
                acc += sum(jnp.sum(v[::1024]) for v in parts.values())
            return acc

        @jax.jit
        def batch(M, c, ct, vl, key):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(M.shape[0]))
            return jnp.sum(jax.vmap(one)(M, c, ct, vl, keys))

        return batch

    labels = ["S0 models+DFs", "S1 +speed tables", "S2 +radius tables",
              "S3 +dm/star draws", "S4 +gas draws+mixing (full cfg6)"]
    compile_s, warm_s = [], []
    for stage in range(5):
        fn = make(stage)

        def run():
            tot = 0.0
            for b0 in range(0, n_sc, n_batch):
                sl = slice(b0, b0 + n_batch)
                tot += float(fn(jnp.asarray(p["M200"])[sl],
                                jnp.asarray(p["conc"])[sl],
                                ctr[sl], vel[sl], jax.random.key(b0)))
            return tot

        t0 = time.time()
        run()
        compile_s.append(time.time() - t0)
        times = []
        for _ in range(3):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        warm_s.append(sorted(times)[1])
        print(f"# {labels[stage]}: compile+first {compile_s[-1]:.1f}s "
              f"warm {warm_s[-1]:.3f}s", flush=True)

    print("\n# ---- attribution (consecutive differences) ----")
    prev_w, prev_c = 0.0, 0.0
    for lab, w, c in zip(labels, warm_s, compile_s):
        print(f"# {lab}: +{w - prev_w:.3f}s warm, +{c - prev_c:.1f}s "
              "cold-compile", flush=True)
        prev_w, prev_c = w, c
    print(f"# cfg6 full warm: {warm_s[-1]:.3f}s "
          f"({n_sc / warm_s[-1]:.1f} scenes/s); "
          f"cold compile total {compile_s[-1]:.1f}s")


if __name__ == "__main__":
    main()
