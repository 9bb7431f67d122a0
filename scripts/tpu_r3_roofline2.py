#!/usr/bin/env python
"""Round-3 roofline, v2: amortized-loop measurements.

v1 (tpu_r3_roofline.py) exposed a ~30 ms per-dispatch latency floor
through the axon tunnel (every warm measurement bottomed out there), so
single-shot "peaks" were floor-limited.  v2 amortizes: each peak op runs
K serial-dependent iterations inside ONE jitted program, so per-iteration
cost = (t - floor)/K with the floor diluted K-fold.  Stages likewise:
S1/S2 amortize over a vmapped batch, S3 over K keyed repeats.

Run: nohup python scripts/tpu_r3_roofline2.py > /tmp/roofline3b.log 2>&1 &
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
    log(f"devices: {jax.devices()}")
    FLOOR_PROBE = jax.jit(lambda x: x + 1.0)
    t_floor = timed("F  dispatch floor (scalar add)", FLOOR_PROBE,
                    jnp.float32(1.0))

    # ------------------------------------------------------------- peaks
    K = 4 if SM else 32
    n = (1 if SM else 256) * 1024 * 1024
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def saxpy_k(x):
        def body(i, y):
            return 0.999 * y + x
        return jax.lax.fori_loop(0, K, body, x)

    t = timed(f"P1 saxpy x{K} (1GiB each)", saxpy_k, x)
    bw = K * 3 * 4 * n / max(t - t_floor, 1e-9)
    log(f"  -> HBM stream {bw/1e9:.0f} GB/s (floor-corrected)")

    KM = 2 if SM else 16
    k = 512 if SM else 8192
    a16 = jnp.full((k, k), 1.0 / k, jnp.bfloat16)

    @jax.jit
    def mm16_k(a):
        def body(i, c):
            return (c @ a).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, KM, body, a)

    t = timed(f"P2 bf16 {k}^3 matmul x{KM}", mm16_k, a16)
    f16 = KM * 2 * k**3 / max(t - t_floor, 1e-9)
    log(f"  -> MXU bf16 {f16/1e12:.1f} Tf/s")

    k32 = 512 if SM else 4096
    a32 = jnp.full((k32, k32), 1.0 / k32, jnp.float32)

    @jax.jit
    def mm32_k(a):
        def body(i, c):
            return c @ a
        return jax.lax.fori_loop(0, KM, body, a)

    t = timed(f"P3 f32 {k32}^3 matmul x{KM}", mm32_k, a32)
    f32r = KM * 2 * k32**3 / max(t - t_floor, 1e-9)
    log(f"  -> MXU f32 {f32r/1e12:.1f} Tf/s")

    k64 = 256 if SM else 2048
    a64 = jnp.full((k64, k64), 1.0 / k64, jnp.float64)

    @jax.jit
    def mm64_k(a):
        def body(i, c):
            return c @ a
        return jax.lax.fori_loop(0, KM, body, a)

    t = timed(f"P4 f64 {k64}^3 matmul x{KM}", mm64_k, a64)
    f64r = KM * 2 * k64**3 / max(t - t_floor, 1e-9)
    log(f"  -> f64-emulated matmul {f64r/1e12:.2f} Tf/s")

    m = (1 if SM else 64) * 1024 * 1024
    x64 = jnp.ones((m,), jnp.float64)

    @jax.jit
    def ew64_k(x):
        def body(i, y):
            return y * 1.0000001 + 1e-7
        return jax.lax.fori_loop(0, K, body, x)

    t = timed(f"P5 f64 elementwise x{K}", ew64_k, x64)
    ew_bw = K * 2 * 8 * m / max(t - t_floor, 1e-9)
    log(f"  -> f64 elementwise stream {ew_bw/1e9:.0f} GB/s")

    # f32 gather rate (the draw stage's primitive), amortized
    rows = 1_046_017
    tab = jnp.ones((rows, 2), jnp.float32)
    NG = 1_000_00 if SM else 10_000_000
    idx = jax.random.randint(jax.random.key(1), (NG,), 0, rows - 1)

    @jax.jit
    def gather_k(idx):
        def body(i, acc):
            return acc + jnp.sum(tab[(idx + i) % (rows - 1)], axis=None)
        return jax.lax.fori_loop(0, 4, body, 0.0)

    t = timed("P6 row-of-2 gather x4 (8MB tab)", gather_k, idx)
    g_rate = 4 * NG / max(t - t_floor, 1e-9)
    log(f"  -> gather issue rate {g_rate/1e6:.0f} Mrow/s "
        f"({g_rate*8/1e9:.1f} GB/s of row bytes)")

    # ------------------------------------------------------------ stages
    from cluster_generator_tpu.parallel.ensemble import build_ensemble
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic,
    )

    # S1 throughput mode: 64 clusters vmapped (the ensemble path)
    B = 4 if SM else 64
    M200b = jnp.linspace(8.0e14, 2.0e15, B)
    concb = jnp.linspace(3.5, 6.0, B)
    t_e = timed(f"S1b ensemble build x{B} (1000pt)",
                lambda M, c: build_ensemble(M, c, num_points=1000)["dm_df"],
                M200b, concb)
    log(f"  -> {B/max(t_e - t_floor, 1e-9):.0f} clusters/s throughput; "
        "single-build 32 ms == dispatch floor -> latency-bound confirmed")

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    build = jax.jit(lambda M, c: build_merger_models(M, c, num_points=1000))
    fields = build(M200, conc)

    KT = 2 if SM else 8

    @jax.jit
    def tables_k(fields):
        def body(i, acc):
            f2 = {k: v * (1.0 + 1e-9 * i) if k == "dm_df" else v
                  for k, v in fields.items()}
            return acc + jnp.sum(build_speed_tables(f2)["dm"])
        return jax.lax.fori_loop(0, KT, body, 0.0)

    t_t = timed(f"S2b speed tables x{KT}", tables_k, fields)
    per_t = (t_t - t_floor) / KT
    log(f"  -> {per_t*1e3:.1f} ms/table-build amortized")

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
            return acc + jnp.sum(p["dm", "particle_velocity"][-2:, 0])
        return jax.lax.fori_loop(0, 4, body, 0.0)

    t_d = timed("S3b draws 1e7 x4", draws_k, jax.random.key(0))
    per_d = (t_d - t_floor) / 4
    log(f"  -> {per_d*1e3:.1f} ms/1e7-draw amortized = "
        f"{N/per_d/1e6:.0f} Mparticle/s; "
        f"~{(2*8 + 7*4)*N/per_d/1e9:.0f} GB/s at 44 B/particle "
        f"(2 row-gathers + 7 f32 outputs)")

    log("ROOFLINE2 SUMMARY: floor "
        f"{t_floor*1e3:.1f} ms | HBM {bw/1e9:.0f} GB/s, "
        f"bf16 {f16/1e12:.0f} Tf/s, f32 {f32r/1e12:.1f} Tf/s, "
        f"f64mm {f64r/1e12:.2f} Tf/s, f64ew {ew_bw/1e9:.0f} GB/s, "
        f"gather {g_rate/1e6:.0f} Mrow/s | "
        f"tables {per_t*1e3:.0f} ms, draws {per_d*1e3:.0f} ms/1e7")


if __name__ == "__main__":
    main()
