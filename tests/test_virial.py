"""Eddington inversion: parity vs the scipy reference algorithm, positivity,
virial self-consistency (reference virial.py + tests/test_models.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.interpolate import InterpolatedUnivariateSpline as IUS

from cluster_generator_tpu.virial import (
    check_virial_density,
    compute_df,
    speed_inverse_cdf_table,
)


def _scipy_df(ee, pden, eps=1.49e-8):
    """Reference DF algorithm (virial.py:43-68) with scipy, at the
    reference's default quad tolerance."""
    import warnings

    dens_sp = IUS(ee, pden)
    g = np.zeros(ee.size)
    dgdp = lambda t, e: 2 * dens_sp(e - t * t, 1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # quad roundoff warning at E_max
        for i in range(ee.size):
            g[i] = quad(dgdp, 0.0, np.sqrt(ee[i]), epsabs=eps, epsrel=eps,
                        limit=400, args=(ee[i],))[0]
    g_sp = IUS(ee, g)
    return g_sp(ee, 1) / (np.sqrt(8.0) * np.pi**2)


def test_df_matches_scipy_reference(canonical_model):
    """f(E) parity at the BASELINE.md target: median <= 1e-6 relative.

    compute_df's g(E) is exact (closed-form Abel integral), so the residual
    here is scipy.quad's own default tolerance amplified by the g-spline
    differentiation.  Floor proof (2026-08, canonical model): mine vs
    scipy(eps=1e-12) median 1.8e-7 / max 9.3e-6; scipy(default) vs
    scipy(1e-12) median 6.9e-7 / max 9.3e-6 — scipy's default-tolerance
    noise IS the observed gap, and the endpoint max is scipy roundoff-
    limited (quad emits its roundoff warning at E_max)."""
    v = canonical_model.dm_virial
    ee = v.ee
    pden = np.asarray(canonical_model["dark_matter_density"])[::-1]
    ref = _scipy_df(ee, pden)
    mine = v.ff
    rel = np.abs(mine - ref) / np.abs(ref)
    assert np.median(rel) < 1e-6, np.median(rel)
    assert rel.max() < 5e-5, rel.max()


@pytest.mark.slow
def test_df_g_integral_exact(canonical_model):
    """_abel_g_exact against tight-tolerance quadrature of the SAME spline:
    the closed form must agree to ~1e-9 (it is exact; quad's 1e-12-eps
    adaptive error is the comparison floor)."""
    import jax.numpy as jnp

    from cluster_generator_tpu.core.interp import cubic_spline, spline_eval
    from cluster_generator_tpu.virial import _abel_g_exact

    v = canonical_model.dm_virial
    ee = v.ee
    pden = np.asarray(canonical_model["dark_matter_density"])[::-1]
    sp = cubic_spline(jnp.asarray(ee), jnp.asarray(pden))
    g = np.asarray(_abel_g_exact(sp, jnp.asarray(ee)))

    def rho_prime(psi):
        return np.asarray(spline_eval(sp, psi, nu=1))

    idx = np.unique(np.linspace(1, ee.size - 1, 12).astype(int))
    for i in idx:
        ref = quad(lambda t, e: 2 * rho_prime(e - t * t), 0.0,
                   np.sqrt(ee[i]), args=(ee[i],), epsabs=1e-12,
                   epsrel=1e-12, limit=500)[0]
        assert abs(g[i] - ref) / abs(ref) < 5e-8, (i, abs(g[i] - ref) / ref)


def test_df_positive(canonical_model):
    assert (canonical_model.dm_virial.df >= 0).all()
    assert (canonical_model.star_virial.df >= 0).all()


def test_virial_signed_residual(canonical_model):
    """Signed deviation < 1e-4, exactly the reference's assertion
    (test_models.py:116-148)."""
    _, chk = canonical_model.check_dm_virial()
    assert np.all(chk < 1.0e-4), chk.max()
    _, chk_s = canonical_model.check_star_virial()
    assert np.all(chk_s < 1.0e-4), chk_s.max()


def test_virial_abs_residual_in_core(canonical_model):
    """Away from the outer boundary the DF reconstruction is accurate in
    absolute terms too."""
    _, chk = canonical_model.check_dm_virial()
    assert np.abs(chk[:800]).max() < 2e-2, np.abs(chk[:800]).max()
    assert np.median(np.abs(chk)) < 1e-4


def test_check_virial_vs_scipy(canonical_model):
    v = canonical_model.dm_virial
    ee = jnp.asarray(v.ee)
    rho_mine = np.asarray(check_virial_density(ee, jnp.asarray(v.ff)))
    f_sp = IUS(v.ee, v.ff)
    idx = np.unique(np.linspace(10, v.ee.size - 1, 20).astype(int))
    for i in idx:
        e = v.ee[i]
        ref = 4 * np.pi * quad(lambda x: f_sp(x) * np.sqrt(2 * (e - x)),
                               0.0, e, limit=200)[0]
        assert abs(rho_mine[i] - ref) / ref < 1e-4


def test_speed_table_quantiles(canonical_model):
    """Inverse speed-CDF: re-derive the CDF at a grid psi and verify the
    table's quantiles invert it."""
    v = canonical_model.dm_virial
    ee = v.ee
    ff = v.ff
    s_inv = np.asarray(speed_inverse_cdf_table(jnp.asarray(ee),
                                               jnp.asarray(ff)))
    f_sp = IUS(ee, ff)
    j = ee.size // 2
    psi = ee[j]
    pdf = lambda s: s**2 * max(f_sp(psi * (1 - s**2)), 0.0)
    norm = quad(pdf, 0, 1, limit=200)[0]
    n_q = s_inv.shape[1]
    for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
        s_q = np.interp(q, np.linspace(0, 1, n_q), s_inv[j])
        cdf_at = quad(pdf, 0, s_q, limit=200)[0] / norm
        assert abs(cdf_at - q) < 2e-3, (q, cdf_at)


def test_df_resume_skips_recompute(canonical_model, tmp_path):
    import cluster_generator_tpu as cg

    fn = str(tmp_path / "m.h5")
    canonical_model.write_model_to_h5(fn)
    m2 = cg.ClusterModel.from_h5_file(fn)
    # resumed DF should be identical, not re-derived
    assert np.array_equal(m2.dm_virial.df, canonical_model.dm_virial.df)


def test_table_uniform_energy_lerp_accuracy(canonical_model):
    """The f32 table path evaluates f(E) through a 4096-node uniform-E
    lerp (round 3); pin its error against the exact-f64 cubic path: the
    inverse-CDF tables must agree to well under the 1/n_q quantile
    resolution everywhere that matters."""
    import jax.numpy as jnp

    from cluster_generator_tpu.virial import speed_inverse_cdf_table

    v = canonical_model.dm_virial
    ee = jnp.asarray(v.ee)
    ff = jnp.asarray(v.ff)
    idx = np.unique(np.round(np.linspace(0, ee.shape[0] - 1,
                                         256)).astype(int))
    row_ee = ee[idx]
    fast = np.asarray(speed_inverse_cdf_table(
        ee, ff, row_ee=row_ee, n_s=512, n_q=512,
        table_dtype=jnp.float32))
    exact = np.asarray(speed_inverse_cdf_table(
        ee, ff, row_ee=row_ee, n_s=512, n_q=512, table_dtype=None))
    # s_inv entries are speed FRACTIONS in [0, 1]; measured at
    # NF=16384: median 5.2e-6, p99 4.7e-4, max 2.3e-3 (the max sits in
    # the steep-f(E) highest-energy rows and is level with the 1/n_q
    # quantile resolution)
    diff = np.abs(fast - exact)
    assert np.median(diff) < 5e-5, np.median(diff)
    assert np.quantile(diff, 0.99) < 1e-3, np.quantile(diff, 0.99)
    assert diff.max() < 5e-3, diff.max()
