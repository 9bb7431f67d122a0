"""Differentiability through the whole pipeline — a capability the
reference's scipy/Cython stack cannot offer: gradients of any model field
with respect to cluster parameters (for fitting, calibration, simulation-
based inference)."""

import jax
import jax.numpy as jnp
import numpy as np

import cluster_generator_tpu as cg
from cluster_generator_tpu.parallel.ensemble import build_one_cluster


def test_profile_param_gradients():
    """d/dM0 of the Hernquist mass profile == M(r)/M0 (linearity)."""

    def mass_at(M0):
        return cg.hernquist_mass_profile(M0, 600.0)(jnp.asarray([500.0]))[0]

    g = jax.grad(mass_at)(1.0e15)
    expected = float(mass_at(1.0e15)) / 1.0e15
    assert abs(float(g) - expected) / expected < 1e-12


def test_grad_through_hse_build():
    """Gradient of the central pressure w.r.t. M200 through the ENTIRE
    build (profiles -> bisection -> quadrature -> splines), validated
    against central finite differences."""

    def central_pressure(M200):
        fields = build_one_cluster(M200, 4.0, num_points=256, with_df=False)
        return fields["pressure"][0]

    g = jax.grad(central_pressure)(1.5e15)
    eps = 1.0e10
    fd = (float(central_pressure(1.5e15 + eps))
          - float(central_pressure(1.5e15 - eps))) / (2 * eps)
    assert np.isfinite(float(g))
    assert abs(float(g) - fd) / abs(fd) < 1e-3, (float(g), fd)


def test_grad_through_eddington_df():
    """f(E) is differentiable w.r.t. cluster mass too."""

    def df_mid(M200):
        fields = build_one_cluster(M200, 4.0, num_points=256, with_df=True)
        return fields["dm_df"][128]

    g = jax.grad(df_mid)(1.5e15)
    eps = 5.0e10
    fd = (float(df_mid(1.5e15 + eps)) - float(df_mid(1.5e15 - eps))) / (2 * eps)
    assert np.isfinite(float(g))
    assert abs(float(g) - fd) / abs(fd) < 5e-3, (float(g), fd)


def test_jacobian_over_ensemble():
    """Per-cluster gradients vmap across an ensemble batch."""

    def tmax(M200, conc):
        f = build_one_cluster(M200, conc, num_points=128, with_df=False)
        return jnp.max(f["temperature"])

    M = jnp.asarray([1.0e15, 1.5e15, 2.0e15])
    c = jnp.asarray([4.0, 5.0, 6.0])
    grads = jax.vmap(jax.grad(tmax, argnums=(0, 1)))(M, c)
    assert np.isfinite(np.asarray(grads[0])).all()
    assert np.isfinite(np.asarray(grads[1])).all()
    # hotter clusters for higher mass
    assert (np.asarray(grads[0]) > 0).all()
