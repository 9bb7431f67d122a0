"""Debug sanitizers (SURVEY.md §5.2 rebuild target).

The reference is single-threaded and has no sanitizers; the TPU-native
analogues are jit-purity / NaN guards and physics validation of built
models.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

from .logging import mylog

__all__ = ["nan_guard", "validate_model_fields"]


@contextlib.contextmanager
def nan_guard():
    """Enable jax debug_nans within a scope — any NaN produced by a jitted
    computation raises immediately at the producing op."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def validate_model_fields(fields: dict, raise_on_error: bool = True) -> list:
    """Physics sanity of a built model field dict.

    Checks: finiteness everywhere; positive density/pressure/temperature;
    non-decreasing enclosed masses; negative potential; non-negative DM
    density (the clamp of model.py:252-253 guarantees it).
    Returns the list of violated checks.
    """
    problems = []

    def chk(cond, msg):
        if not cond:
            problems.append(msg)

    for name, arr in fields.items():
        a = np.asarray(arr)
        chk(np.isfinite(a).all(), f"{name} contains non-finite values")
    for name in ["density", "pressure", "temperature", "total_density"]:
        if name in fields:
            chk((np.asarray(fields[name]) > 0).all(), f"{name} not positive")
    for name in ["total_mass", "gas_mass", "stellar_mass"]:
        if name in fields:
            m = np.asarray(fields[name])
            chk((np.diff(m) >= -1e-8 * m[-1]).all(),
                f"{name} not non-decreasing")
    if "gravitational_potential" in fields:
        chk((np.asarray(fields["gravitational_potential"]) < 0).all(),
            "gravitational_potential not negative")
    if "dark_matter_density" in fields:
        dd = np.asarray(fields["dark_matter_density"])
        chk((dd >= 0).all(), "dark_matter_density negative")
        if dd.sum() <= 0:
            mylog.warning(
                "The total dark matter mass is either zero or negative!!")

    if problems and raise_on_error:
        raise ValueError("model validation failed: " + "; ".join(problems))
    for p in problems:
        mylog.warning("model validation: %s", p)
    return problems
