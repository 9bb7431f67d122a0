"""Fast-compiling cumulative ops.

The XLA TPU lowering of the ``cumsum`` primitive (a reduce-window) takes
O(100 s) to *compile* on the current toolchain for even a 1000-element f64
array (measured via the axon remote-compile path; the CPU backend is fine).
Since every cumulative integral in this framework runs over modest
static-size grids (<= a few thousand points), we lower cumsum to a
triangular matrix product — which the MXU eats for breakfast and XLA
compiles in <1 s — and fall back to ``lax.associative_scan`` for large
arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cumsum"]

_MATMUL_MAX = 8192


def cumsum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inclusive cumulative sum along ``axis`` (jnp.cumsum semantics)."""
    x = jnp.asarray(x)
    axis = axis % x.ndim
    n = x.shape[axis]
    if n <= _MATMUL_MAX:
        # moveaxis to last, (…, n) @ (n, n) upper-triangular ones:
        # out[..., j] = sum_{i <= j} x[..., i]
        xt = jnp.moveaxis(x, axis, -1)
        tri = jnp.triu(jnp.ones((n, n), x.dtype))
        out = jnp.matmul(xt, tri, precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out, -1, axis)
    return jax.lax.associative_scan(jnp.add, x, axis=axis)
