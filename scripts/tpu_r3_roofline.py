#!/usr/bin/env python
"""Round-3 roofline accounting (VERDICT r2 Next #3).

Measures this machine's ACHIEVABLE peaks empirically (not datasheet
numbers — the axon tunnel and emulations are part of the machine):

  P1 HBM stream     saxpy over 1 GB f32 (bytes = 3 x size / t)
  P2 MXU bf16       8192^3 matmul
  P3 MXU f32        4096^3 matmul
  P4 f64 matmul     2048^3 (emulation cost shows directly)

then times the four headline stages and reports achieved bytes/s and
flop/s against those peaks:

  S1 model solve f64      (2-halo, 1000-pt merger build)
  S2 speed-table build    (256 rows x n_s=512 cumsum+invert, f32)
  S3 draws 1e7            (gathers + RNG + isotropic)
  S4 512^3 GRF            (fused one-pass k-space magnetic field)

Analytic byte/flop counts per stage are documented inline; results land
in docs/performance.md "Roofline".

Run: nohup python scripts/tpu_r3_roofline.py > /tmp/roofline3.log 2>&1 &
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


def timed(name, fn, *args, n=5):
    t0 = time.time()
    force(fn(*args))
    c = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"{name:30s} compile+1st {c:7.2f}s  warm {med*1e3:9.2f} ms")
    return med


def main():
    log(f"devices: {jax.devices()}")

    # ---------------------------------------------------------- peaks
    SM = bool(os.environ.get("SMOKE"))
    n = (4 if SM else 256) * 1024 * 1024  # 1 GiB of f32
    x = jnp.ones((n,), jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    @jax.jit
    def saxpy(x, y):
        return 2.0 * x + y

    t = timed("P1 saxpy 1GiB", saxpy, x, y)
    bw = 3 * 4 * n / t
    log(f"  -> HBM stream {bw/1e9:.0f} GB/s")

    k = 1024 if SM else 8192
    a16 = jnp.ones((k, k), jnp.bfloat16)

    @jax.jit
    def mm16(a):
        return a @ a

    t = timed("P2 bf16 8192^3 matmul", mm16, a16)
    f16 = 2 * k**3 / t
    log(f"  -> MXU bf16 {f16/1e12:.1f} Tf/s")

    k = 512 if SM else 4096
    a32 = jnp.ones((k, k), jnp.float32)

    @jax.jit
    def mm32(a):
        return a @ a

    t = timed("P3 f32 4096^3 matmul", mm32, a32)
    f32r = 2 * k**3 / t
    log(f"  -> MXU f32 {f32r/1e12:.1f} Tf/s")

    k = 256 if SM else 2048
    a64 = jnp.ones((k, k), jnp.float64)

    @jax.jit
    def mm64(a):
        return a @ a

    t = timed("P4 f64 2048^3 matmul", mm64, a64)
    f64r = 2 * k**3 / t
    log(f"  -> f64-emulated matmul {f64r/1e12:.2f} Tf/s")

    # elementwise f64 rate (the model solve is mostly elementwise/quad)
    m = (1 if SM else 64) * 1024 * 1024
    x64 = jnp.ones((m,), jnp.float64)

    @jax.jit
    def ew64(x):
        return x * 1.0000001 + jnp.sqrt(x)

    t = timed("P5 f64 elementwise 0.5GiB", ew64, x64)
    log(f"  -> f64 elementwise stream {2*8*m/t/1e9:.0f} GB/s")

    # ---------------------------------------------------------- stages
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
    t_m = timed("S1 model solve f64",
                lambda M, c: build(M, c)["dm_df"], M200, conc)
    fields = build(M200, conc)
    # S1 is grid-sized (2 x 1000 pts x ~16 fields x 8 B ~ 0.26 MB state):
    # latency/serial-dependency bound, not throughput bound.  Report the
    # equivalent stream for context only.
    log(f"  -> S1 state ~0.3 MB; {0.3e6/t_m/1e9:.4f} GB/s equivalent "
        "(latency-bound by design: PCR splines + fixed quadrature chains)")

    tb = jax.jit(build_speed_tables)
    t_t = timed("S2 speed tables", lambda f: tb(f)["dm"], fields)
    tables = tb(fields)
    s_inv = tables["dm"]
    rows, n_q = s_inv.shape[1], s_inv.shape[2]
    n_s = 512
    # per halo: (rows x n_s) pdf eval (~20 flops) + cumsum (log2(n_s)
    # passes) + (rows x n_q) inversion via masked reductions over n_s
    byts = 2 * (rows * n_s * 4 * (2 + np.log2(n_s)) + rows * n_q * 4)
    flops = 2 * (rows * n_s * (20 + np.log2(n_s) * 2) + rows * n_q * n_s)
    log(f"  -> S2 ~{byts/1e6:.0f} MB touched, ~{flops/1e9:.1f} Gflop: "
        f"{byts/t_t/1e9:.0f} GB/s ({byts/t_t/bw*100:.0f}% of stream), "
        f"{flops/t_t/1e12:.2f} Tf/s")

    tables["radius"] = jax.jit(build_radius_tables)(fields, rmax)
    N = 100_000 if SM else 10_000_000
    counts = ((30_000, 20_000), (24_000, 16_000), (6_000, 4_000)) if SM \
        else ((3_000_000, 2_000_000), (2_400_000, 1_600_000),
              (600_000, 400_000))

    @jax.jit
    def draws(key):
        p = sample_merger_ic(fields, tables, centers, vels, rmax, key,
                             *counts)
        return p["dm", "particle_velocity"][:, 0]

    t_d = timed("S3 draws 1e7", draws, jax.random.key(0))
    # per particle (collisionless): 2 row-of-2 gathers (16 B) + ~6 uniform
    # draws (4 B each out) + isotropic trig; outputs pos+vel+mass 28 B.
    # gas adds the mix row-of-4.  Rough: 80 B HBM traffic / particle.
    log(f"  -> S3 {80*N/t_d/1e9:.0f} GB/s of ~{bw/1e9:.0f} "
        f"({80*N/t_d/bw*100:.0f}% of stream) at 80 B/particle accounting; "
        f"{N/t_d/1e6:.0f} Mparticle/s")

    from cluster_generator_tpu.fields.grf import RandomMagneticField

    def grf(i):
        f = RandomMagneticField([-1000.0] * 3, [1000.0] * 3,
                                ((64,)*3 if SM else (512,)*3), 50.0, 500.0, 1.0e-6,
                                padding=0.0, prng=42 + i,
                                dtype=jnp.float32)
        return f.gx

    t_g = timed("S4 512^3 GRF", grf, 0)
    # 6 c64 FFTs over 512^3 (3 forward noise + 3 inverse after projection)
    # + elementwise k-space ops.  FFT flops ~ 5 n log2 n per c64 FFT ;
    # bytes ~ 2 passes x 8 B x n per FFT + projection pass.
    nvox = 512**3
    fft_flops = 6 * 5 * nvox * np.log2(nvox)
    fft_bytes = 6 * 3 * 8 * nvox + 4 * 8 * nvox
    log(f"  -> S4 ~{fft_flops/1e12:.2f} Tflop, ~{fft_bytes/1e9:.1f} GB: "
        f"{fft_flops/t_g/1e12:.1f} Tf/s, {fft_bytes/t_g/1e9:.0f} GB/s "
        f"({fft_bytes/t_g/bw*100:.0f}% of stream)")

    log("ROOFLINE SUMMARY: peaks "
        f"HBM {bw/1e9:.0f} GB/s, bf16 {f16/1e12:.0f} Tf/s, "
        f"f32 {f32r/1e12:.0f} Tf/s, f64mm {f64r/1e12:.2f} Tf/s | stages "
        f"S1 {t_m*1e3:.0f}ms S2 {t_t*1e3:.0f}ms S3 {t_d*1e3:.0f}ms "
        f"S4 {t_g*1e3:.0f}ms")


if __name__ == "__main__":
    main()
