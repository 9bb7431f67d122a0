"""Pallas TPU kernels for the hot table ops.

``invert_cdf_rows`` inverts a batch of monotone CDF rows onto a uniform
quantile grid — the core of the velocity inverse-CDF table build
(virial.speed_inverse_cdf_table).  The jnp implementation vmapped
``jnp.interp`` does n_q binary searches + gathers per row; TPUs hate
per-lane dynamic gathers.  Here inversion is recast as a *masked
reduction*: with uniform sample grid s_k and quantiles q_m,

    s_inv[m] = sum_k [c_k <= q_m < c_{k+1}] * (s_k + (q_m - c_k) ds / (c_{k+1} - c_k))

— an O(n_s x n_q) elementwise product + reduction per row, perfectly
shaped for the VPU (8x128 lanes), zero gathers.  Rows are tiled over the
grid; each program keeps its (ROWS_PER_BLOCK, n_q, n_s) working set in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels run via interpret there
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

__all__ = ["invert_cdf_rows"]

_ROWS = 8  # rows per program: ROWS * n_q * n_s * 4B VMEM working set


def _invert_kernel_matshaped(cdf_ref, out_ref, *, n_q):
    """A block of _ROWS CDF rows per program; an in-kernel fori loop keeps
    every tensor strictly 2D (Mosaic's gather-free lowering path, and the
    (8, 128)-divisible tile constraint applies to the *block*, not the
    per-row working set).

    Per row: mask (n_q, n_s-1) from 2D broadcasted iotas — ~2 MB f32 in
    VMEM for n_q=512, n_s=1024.
    """
    rows, n_s = cdf_ref.shape
    ds = 1.0 / (n_s - 1)
    dq = 1.0 / (n_q - 1)
    # Mosaic's tpu.iota is integer-only; cast afterwards.  All lane widths
    # stay n_s/n_q (128-aligned for the production sizes): the c_{k+1}
    # shift uses pltpu.roll instead of an odd-width slice, with the wrapped
    # last column masked off via a column iota.
    q = (jax.lax.broadcasted_iota(jnp.int32, (n_q, 1), 0)
         .astype(jnp.float32) * dq)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_s), 1)
    s_lo = col.astype(jnp.float32) * ds
    valid = col < (n_s - 1)

    # the final bin is right-closed (col == n_s-2 admits q up to 1.0), so
    # exactly one bin matches every quantile — a single masked reduction,
    # no follow-up coverage fixup
    last_bin = col == (n_s - 2)

    # static unroll over the block's rows: all slices/indices static, no
    # dynamic sublane access for Mosaic to trip on
    for r in range(rows):
        c_lo = cdf_ref[r:r + 1, :]              # (1, n_s)
        # circular shift by -1 == +(n_s-1); pltpu.roll requires shift >= 0
        # and an i32 shift operand (x64 mode would promote a python int)
        shift = jnp.array(n_s - 1, jnp.int32)
        c_hi = (pltpu.roll(c_lo, shift, axis=1) if _HAS_PLTPU
                else jnp.roll(c_lo, shift, axis=1))
        inv_dc = 1.0 / jnp.maximum(c_hi - c_lo, 1e-30)
        mask = (c_lo <= q) & ((q < c_hi) | last_bin) & valid  # (n_q, n_s)
        val = jnp.where(mask, s_lo + (q - c_lo) * inv_dc * ds, 0.0)
        out_ref[r, :] = jnp.sum(val, axis=1)


@partial(jax.jit, static_argnames=("n_q", "interpret"))
def invert_cdf_rows(cdf: jnp.ndarray, n_q: int = 512,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Invert monotone CDF rows sampled on a uniform [0, 1] s-grid.

    cdf: (N, n_s) float32/float64, each row non-decreasing with
    cdf[:, 0] == 0 and cdf[:, -1] == 1.
    Returns s_inv: (N, n_q) float32 — s at quantiles linspace(0, 1, n_q).

    ``interpret=None`` compiles on TPU backends and interprets elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, n_s = cdf.shape
    cdf32 = cdf.astype(jnp.float32)
    rows = _ROWS
    pad = (-N) % rows
    if pad:
        cdf32 = jnp.concatenate(
            [cdf32, jnp.tile(cdf32[-1:], (pad, 1))], axis=0)
    n_pad = cdf32.shape[0]

    # Trace the kernel with x64 disabled: under jax_enable_x64 the Mosaic
    # module picks up stray 64-bit scalars (empirically: the identical
    # kernel compiles with x64 off and crashes the TPU compiler with it
    # on).  All kernel I/O is explicitly f32, so the result is unchanged.
    try:
        from jax.experimental import disable_x64
    except ImportError:  # private fallback for older layouts
        from jax._src.config import enable_x64

        def disable_x64():
            return enable_x64(False)

    with disable_x64():
        out = pl.pallas_call(
            partial(_invert_kernel_matshaped, n_q=n_q),
            out_shape=jax.ShapeDtypeStruct((n_pad, n_q), jnp.float32),
            grid=(n_pad // rows,),
            in_specs=[pl.BlockSpec((rows, n_s), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, n_q), lambda i: (i, 0)),
            interpret=interpret,
        )(cdf32)
    return out[:N]


def invert_cdf_rows_reference(cdf: jnp.ndarray, n_q: int = 512):
    """jnp reference implementation (vmapped interp) for testing."""
    n_s = cdf.shape[1]
    s = jnp.linspace(0.0, 1.0, n_s)
    q = jnp.linspace(0.0, 1.0, n_q)
    return jax.vmap(lambda c: jnp.interp(q, c, s))(cdf)
