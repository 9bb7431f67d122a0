#!/usr/bin/env python
"""Round-3: where do the 512^3 GRF's 0.64 s go, and is rfftn the win?

The fused GRF (fields/grf._grf_core_fused) runs 3 forward + 3 inverse
full-complex 512^3 FFTs on REAL noise.  Roofline v1 put the whole stage
at ~37 GB/s of a 661 GB/s stream — so either TPU FFT is the wall, or the
full-complex transforms are paying 2x for Hermitian-redundant halves.

  G1 single fftn 512^3 c64          the FFT unit cost
  G2 single rfftn 512^3 (f32 in)    half-spectrum forward
  G3 single irfftn (half-spectrum)  half-spectrum inverse
  G4 current _grf_core_fused        the stage baseline
  G5 rfft-based fused variant       3x rfftn + k-ops on (nx,ny,nz/2+1)
                                    + 3x irfftn, Parseval with Hermitian
                                    weights

Run: nohup python scripts/tpu_r3_grf_ablation.py > /tmp/grf3.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SM = bool(os.environ.get("SMOKE"))
DIM = 64 if SM else 512


def log(msg):
    print(msg, flush=True)


def force(x):
    return float(jnp.sum(jnp.ravel(x)[-2:]).real)


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
    log(f"{name:36s} compile+1st {c:7.2f}s  warm {med*1e3:9.2f} ms")
    return med


def main():
    n = DIM
    x = jax.random.normal(jax.random.key(0), (n, n, n), jnp.float32)

    # lax.fft respects f32/c64 exactly; jnp.fft.rfftn under x64 promotes
    # f32 -> f64 -> c128, which the TPU FFT cannot lower (measured:
    # "Unexpected operand type for FFT: c128")
    from jax import lax

    def rfftn3(x):
        return lax.fft(x, lax.FftType.RFFT, (n, n, n))

    def irfftn3(X):
        return lax.fft(X, lax.FftType.IRFFT, (n, n, n))

    timed("G1 fftn c64", jax.jit(lambda x: lax.fft(
        x.astype(jnp.complex64), lax.FftType.FFT, (n, n, n))), x)
    timed("G2 rfftn f32->c64", jax.jit(rfftn3), x)
    Xh = jax.jit(rfftn3)(x)
    timed("G3 irfftn", jax.jit(irfftn3), Xh)

    # G4: the current production stage
    from cluster_generator_tpu.fields.grf import RandomMagneticField

    def grf(i):
        f = RandomMagneticField([-1000.0] * 3, [1000.0] * 3, (n, n, n),
                                50.0, 500.0, 1.0e-6, padding=0.0,
                                prng=42 + i, dtype=jnp.float32)
        return f.gx

    t4 = timed("G4 current fused GRF", grf, 0)

    # G5: rfft-based variant (standalone prototype of the same math)
    L = 2000.0
    kx = 2 * np.pi * np.fft.fftfreq(n, L / n)
    ky = 2 * np.pi * np.fft.fftfreq(n, L / n)
    kz = 2 * np.pi * np.fft.rfftfreq(n, L / n)
    KX = jnp.asarray(kx)[:, None, None]
    KY = jnp.asarray(ky)[None, :, None]
    KZ = jnp.asarray(kz)[None, None, :]
    k0 = 2 * np.pi / 50.0
    k1 = 2 * np.pi / 500.0
    alpha = -11.0 / 3.0
    # Hermitian weights for Parseval on the half spectrum: interior kz
    # planes represent two full-spectrum modes
    w = jnp.ones((1, 1, kz.size), jnp.float32) * 2.0
    w = w.at[..., 0].set(1.0)
    if n % 2 == 0:
        w = w.at[..., -1].set(1.0)

    @jax.jit
    def grf_rfft(key):
        noise = jax.random.normal(key, (3, n, n, n), jnp.float32)
        kk = jnp.sqrt(KX**2 + KY**2 + KZ**2)
        sigma = (1.0 + (kk / k1) ** 2) ** (0.25 * alpha) * jnp.exp(
            -0.5 * (kk / k0) ** 2)
        sigma = sigma.at[0, 0, 0].set(0.0).astype(jnp.float32)
        W = [rfftn3(noise[i]) * sigma for i in range(3)]

        def power(S):
            return sum(jnp.sum(w * jnp.abs(s) ** 2) for s in S)

        n_cells = n * n * n
        g_avg = jnp.sqrt(power(W) / (n_cells * n_cells))
        scale = (1.0e-6 / g_avg).astype(jnp.float32)
        W = [wv * scale for wv in W]
        p0 = power(W)
        k2 = KX**2 + KY**2 + KZ**2
        k2 = k2.at[0, 0, 0].set(1.0).astype(jnp.float32)
        div = (W[0] * KX + W[1] * KY + W[2] * KZ) / k2
        W = [W[0] - div * KX, W[1] - div * KY, W[2] - div * KZ]
        W = [wv * jnp.sqrt(p0 / power(W)).astype(jnp.float32) for wv in W]
        return tuple(irfftn3(wv) for wv in W)

    t5 = timed("G5 rfft fused variant", lambda k: grf_rfft(k)[0],
               jax.random.key(7))

    # value check: same spectrum statistics (rms within 1%) and div-free
    gx, gy, gz = grf_rfft(jax.random.key(7))
    rms = float(jnp.sqrt(jnp.mean(gx**2 + gy**2 + gz**2)))
    log(f"  G5 rms = {rms:.3e} (target 1e-6); speedup {t4/t5:.2f}x")


if __name__ == "__main__":
    main()
