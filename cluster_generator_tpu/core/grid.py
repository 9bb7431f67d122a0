"""Log-radius grid helpers (the abscissa every model lives on).

The reference builds ``np.logspace(log10(rmin), log10(rmax), num_points)``
(model.py:504, :595, :645).  We keep the identical convention; grids are
static-shape float64 arrays so the entire model build jits once per
(num_points,) shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["log_radius_grid"]


def log_radius_grid(rmin: float, rmax: float, num_points: int = 1000):
    """Log-spaced radius grid in kpc, endpoint inclusive (model.py:504)."""
    return jnp.logspace(jnp.log10(rmin), jnp.log10(rmax), num_points,
                        endpoint=True, dtype=jnp.float64)


def numpy_log_radius_grid(rmin: float, rmax: float, num_points: int = 1000):
    return np.logspace(np.log10(rmin), np.log10(rmax), num_points,
                       endpoint=True, dtype=np.float64)
