#!/usr/bin/env python
"""Stage split of the 1e7-particle merger IC after the row-gather redesign.

Round-1 split (docs/performance.md): models 0.11 s, tables 0.57 s,
draws 0.94 s.  The draws are now ~5x cheaper, so this measures where the
0.41 s fused time actually goes and what the next lever is (expected: the
speed-table build — two (1000 x 1024) cumulative scans + quantile
inversions per halo-species).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cluster_generator_tpu.pipeline import (  # noqa: E402
    build_merger_models,
    build_radius_tables,
    build_speed_tables,
    sample_merger_ic,
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(jnp.ravel(l)[-2:].astype(jnp.float32))
                     for l in leaves))


def timed(name, fn, *args, n=3, **kw):
    t0 = time.time()
    force(fn(*args, **kw))
    log(f"{name}: compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args, **kw))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"{name}: warm {med*1e3:.1f} ms")
    return med


def main():
    log(f"devices: {jax.devices()}")
    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    key = jax.random.key(0)

    t_m = timed("models", build_merger_models, M200, conc)
    fields = build_merger_models(M200, conc)
    t_t = timed("speed tables", build_speed_tables, fields)
    tables = build_speed_tables(fields)
    t_r = timed("radius tables", build_radius_tables, fields, rmax)
    tables["radius"] = build_radius_tables(fields, rmax)
    n_gas, n_dm, n_star = (2_500_000,) * 2, (2_000_000,) * 2, (500_000,) * 2
    t_d = timed("draws 1e7", sample_merger_ic, fields, tables, centers,
                vels, rmax, key, n_gas, n_dm, n_star)
    log(f"SPLIT: models {t_m*1e3:.0f} ms, speed tables {t_t*1e3:.0f} ms, "
        f"radius tables {t_r*1e3:.0f} ms, draws {t_d*1e3:.0f} ms")


if __name__ == "__main__":
    main()
