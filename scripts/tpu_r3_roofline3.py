#!/usr/bin/env python
"""Round-3 roofline, v3: corrections to two v2 artifacts.

1. v2's P3/P4/P5 ran before the package import, i.e. with x64 OFF — the
   "f64" arrays were silently f32, and f32 matmuls lower to bf16 passes
   under default precision.  Here x64 is on from the start and the f32
   matmul uses HIGHEST precision, so P4/P5 measure true f64 emulation.
2. v2's S3b consumed only a 2-element slice of one output, so XLA
   dead-code-eliminated most of the draw work (9 ms/1e7 was an
   artifact).  Here every output array is fully reduced.

Run after v2; only the corrected numbers are reported.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

SM = bool(os.environ.get("SMOKE"))


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
    log(f"{name:34s} compile+1st {c:7.2f}s  warm {med*1e3:9.2f} ms")
    return med


def main():
    log(f"devices: {jax.devices()}  x64={jax.config.jax_enable_x64}")
    t_floor = timed("F  dispatch floor (scalar add)",
                    jax.jit(lambda x: x + 1.0), jnp.float32(1.0))

    KM = 2 if SM else 16
    k32 = 256 if SM else 4096
    a32 = jnp.full((k32, k32), 1.0 / k32, jnp.float32)

    @jax.jit
    def mm32h(a):
        def body(i, c):
            return jax.lax.dot(c, a, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.fori_loop(0, KM, body, a)

    t = timed(f"P3' f32 {k32}^3 HIGHEST x{KM}", mm32h, a32)
    log(f"  -> true-f32 matmul {KM*2*k32**3/max(t-t_floor,1e-9)/1e12:.1f} "
        "Tf/s")

    k64 = 128 if SM else 2048
    a64 = jnp.full((k64, k64), 1.0 / k64, jnp.float64)
    assert a64.dtype == jnp.float64

    @jax.jit
    def mm64(a):
        def body(i, c):
            return jax.lax.dot(c, a, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.fori_loop(0, KM, body, a)

    t = timed(f"P4' f64 {k64}^3 matmul x{KM}", mm64, a64)
    log(f"  -> true-f64 matmul {KM*2*k64**3/max(t-t_floor,1e-9)/1e12:.2f} "
        "Tf/s")

    K = 4 if SM else 32
    m = (1 if SM else 64) * 1024 * 1024
    x64v = jnp.ones((m,), jnp.float64)
    assert x64v.dtype == jnp.float64

    @jax.jit
    def ew64_k(x):
        def body(i, y):
            return y * 1.0000001 + 1e-7
        return jax.lax.fori_loop(0, K, body, x)

    t = timed(f"P5' f64 elementwise x{K}", ew64_k, x64v)
    log(f"  -> true-f64 elementwise stream "
        f"{K*2*8*m/max(t-t_floor,1e-9)/1e9:.0f} GB/s")

    # S3 corrected: fully-consumed draws
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic,
    )

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    build = jax.jit(lambda M, c: build_merger_models(M, c, num_points=1000))
    fields = build(M200, conc)
    tables = jax.jit(build_speed_tables)(fields)
    tables["radius"] = jax.jit(build_radius_tables)(fields, rmax)
    N = 100_000 if SM else 10_000_000
    counts = ((30_000, 20_000), (24_000, 16_000), (6_000, 4_000)) if SM \
        else ((3_000_000, 2_000_000), (2_400_000, 1_600_000),
              (600_000, 400_000))

    @jax.jit
    def draws_k(key):
        def body(i, acc):
            p = sample_merger_ic(fields, tables, centers, vels, rmax,
                                 jax.random.fold_in(key, i), *counts)
            return acc + sum(jnp.sum(v) for v in p.values())
        return jax.lax.fori_loop(0, 4, body, 0.0)

    t_d = timed("S3c draws 1e7 x4 (fully consumed)", draws_k,
                jax.random.key(0))
    per = (t_d - t_floor) / 4
    log(f"  -> {per*1e3:.1f} ms per 1e7-particle IC draw = "
        f"{N/per/1e6:.0f} Mparticle/s; gather-model floor at 191 Mrow/s "
        f"= {2*0.52*N/1.91e8*1e3:.0f} ms for the 2x0.52N collisionless "
        "row fetches")


if __name__ == "__main__":
    main()
