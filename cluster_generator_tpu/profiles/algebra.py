"""Pytree-parameterized radial-profile algebra.

TPU-native redesign of the reference's closure-based ``RadialProfile``
(radial_profiles.py:6-118).  A profile is a pair ``(eval_fn, params)`` where
``eval_fn(params, r)`` is a pure jnp function and ``params`` is a pytree of
traced leaves.  Because ``Profile`` is registered as a pytree node:

* profiles compose (`+`, `*`, `**`, ``add_core``, ``cutoff``) into new pure
  functions, so a whole model build traces into ONE XLA program;
* profiles can be ``vmap``-ped over a *batch of parameters* — the ensemble
  axis of SURVEY.md §7 step 8 (1024 clusters in one launch) falls out for
  free;
* profiles can cross ``jit`` boundaries as arguments without retracing as
  long as the structure (aux fn) is unchanged.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["Profile", "RadialProfile", "constant_profile", "power_law_profile",
           "from_array_profile"]


# --------------------------------------------------------- composition cache
# Composed eval_fns are cached by (op, operand fns) so that building the
# SAME profile expression twice yields the SAME function object — pytree
# treedefs then compare equal and jitted consumers (model builders) do NOT
# retrace per construction.  Library factories use module-level eval fns for
# the same reason; without this, every profile rebuilt in a host-side
# parameter loop recompiled the whole XLA program.
_COMPOSE_CACHE: dict = {}


def _composed(op, f1, f2):
    """Cached eval_fn computing ``op(f1(p1, r), f2(p2, r))`` (or, when
    ``f2`` is None, ``op(f1(p1, r), c)`` with ``c`` a traced parameter)."""
    key = (op, f1, f2)
    if key not in _COMPOSE_CACHE:
        if f2 is None:
            def fn(params, r):
                p1, c = params
                return op(f1(p1, r), c)
        else:
            def fn(params, r):
                p1, p2 = params
                return op(f1(p1, r), f2(p2, r))
        _COMPOSE_CACHE[key] = fn
    return _COMPOSE_CACHE[key]


def _composed_r(op, f1):
    """Cached eval_fn computing ``op(f1(p1, r), c, r)`` — for modifiers
    whose envelope needs the radius (add_core, cutoff)."""
    key = (op, f1)
    if key not in _COMPOSE_CACHE:
        def fn(params, r):
            p1, c = params
            return op(f1(p1, r), c, r)
        _COMPOSE_CACHE[key] = fn
    return _COMPOSE_CACHE[key]


def _pow_op(val, p):
    return val ** p


def _core_op(val, c, r):
    rc, al = c
    return val * (1.0 - jnp.exp(-((r / rc) ** al)))


def _cutoff_op(val, c, r):
    rc, kk = c
    step = 1.0 / (1.0 + jnp.exp(-2.0 * kk * (r / rc - 1.0)))
    return val * (1.0 - step)


@jax.tree_util.register_pytree_node_class
class Profile:
    """A radial profile: ``profile(r)`` evaluates ``eval_fn(params, r)``."""

    def __init__(self, eval_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                 params: Any = ()):
        self.eval_fn = eval_fn
        self.params = params

    # ------------------------------------------------------------- pytree
    def tree_flatten(self):
        return (self.params,), self.eval_fn

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])

    # ------------------------------------------------------------- calling
    def __call__(self, r):
        return self.eval_fn(self.params, jnp.asarray(r))

    # ------------------------------------------------------------ operators
    def _binary(self, other, op):
        if isinstance(other, Profile):
            fn = _composed(op, self.eval_fn, other.eval_fn)
            return Profile(fn, (self.params, other.params))
        # scalar operand becomes a traced parameter
        fn = _composed(op, self.eval_fn, None)
        return Profile(fn, (self.params, other))

    def __add__(self, other):
        return self._binary(other, jnp.add)

    __radd__ = __add__

    def __mul__(self, other):
        return self._binary(other, jnp.multiply)

    __rmul__ = __mul__

    def __sub__(self, other):
        return self._binary(other, jnp.subtract)

    def __truediv__(self, other):
        return self._binary(other, jnp.divide)

    def __pow__(self, power):
        return Profile(_composed(_pow_op, self.eval_fn, None),
                       (self.params, power))

    # ---------------------------------------------------------- modifiers
    def add_core(self, r_core, alpha):
        """Multiply by ``1 - exp(-(r/r_core)^alpha)`` (radial_profiles.py:38-56)."""
        return Profile(_composed_r(_core_op, self.eval_fn),
                       (self.params, (r_core, alpha)))

    def cutoff(self, r_cut, k=5):
        """Multiply by a reversed logistic step at r_cut (radial_profiles.py:58-65)."""
        return Profile(_composed_r(_cutoff_op, self.eval_fn),
                       (self.params, (r_cut, float(k))))

    @classmethod
    def from_array(cls, r, f_r):
        """Profile interpolating tabulated (r, f_r) with a cubic spline
        (radial_profiles.py:67-83)."""
        return from_array_profile(r, f_r)

    # --------------------------------------------------------------- plot
    def plot(self, rmin, rmax, num_points=1000, fig=None, ax=None, lw=2,
             **kwargs):
        """Quick loglog matplotlib plot (radial_profiles.py:85-118)."""
        import matplotlib.pyplot as plt
        import numpy as np

        if fig is None:
            fig = plt.figure(figsize=(10, 10))
        if ax is None:
            ax = fig.add_subplot(111)
        rr = np.logspace(np.log10(rmin), np.log10(rmax), num_points)
        ax.loglog(rr, np.asarray(self(rr)), lw=lw, **kwargs)
        ax.set_xlabel("Radius (kpc)")
        return fig, ax


#: alias matching the reference class name
RadialProfile = Profile


def _constant_fn(p, r):
    return p * jnp.ones_like(r)


def constant_profile(const):
    """Constant profile (radial_profiles.py:121-131)."""
    return Profile(_constant_fn, const)


def _power_law_fn(p, r):
    A_, rs_, al_ = p
    return A_ * (r / rs_) ** al_


def power_law_profile(A, r_s, alpha):
    """A * (r/r_s)^alpha (radial_profiles.py:134-152)."""
    return Profile(_power_law_fn, (A, r_s, alpha))


def _from_array_fn(p, rq):
    from ..core.interp import spline_eval

    return spline_eval(p, rq)


def from_array_profile(r, f_r):
    """Profile through tabulated (r, f_r) points with an INTERPOLATING
    not-a-knot cubic spline.

    Intentional deviation from the reference: its ``from_array`` uses
    scipy ``UnivariateSpline`` with the default smoothing (a fitted, NOT
    interpolating spline — radial_profiles.py:80-82), so noisy inputs are
    smoothed there and reproduced exactly here.  Exact interpolation is
    the right contract for the round-trip uses in this codebase (fields
    tabulated from models); pre-smooth noisy observational data before
    construction if the reference's behavior is wanted.
    """
    from ..core.interp import cubic_spline

    sp = cubic_spline(jnp.asarray(r, jnp.float64), jnp.asarray(f_r, jnp.float64))
    return Profile(_from_array_fn, sp)
