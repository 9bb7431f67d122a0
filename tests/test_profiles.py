"""Profile library: instantiation sweep, algebra, analytic mass checks,
solvers (reference tests/test_radial_profiles.py model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad

import cluster_generator_tpu as cg
from cluster_generator_tpu.profiles import Profile, mass_within

RR = np.logspace(-1, 4, 300)

ALL_PROFILES = {
    "constant": cg.constant_profile(5.0),
    "power_law": cg.power_law_profile(1.0e6, 500.0, -2.0),
    "beta_model": cg.beta_model_profile(1.0e7, 100.0, 0.67),
    "hernquist_density": cg.hernquist_density_profile(1.0e15, 600.0),
    "cored_hernquist_density": cg.cored_hernquist_density_profile(1.0e15, 600.0, 20.0),
    "hernquist_mass": cg.hernquist_mass_profile(1.0e15, 600.0),
    "nfw_density": cg.nfw_density_profile(1.0e7, 500.0),
    "nfw_mass": cg.nfw_mass_profile(1.0e7, 500.0),
    "tnfw_density": cg.tnfw_density_profile(1.0e7, 500.0, 1500.0),
    "tnfw_mass": cg.tnfw_mass_profile(1.0e7, 500.0, 1500.0),
    "snfw_density": cg.snfw_density_profile(1.2e15, 500.0),
    "snfw_mass": cg.snfw_mass_profile(1.2e15, 500.0),
    "cored_snfw_density": cg.cored_snfw_density_profile(1.2e15, 500.0, 50.0),
    "cored_snfw_mass": cg.cored_snfw_mass_profile(1.2e15, 500.0, 50.0),
    "einasto_density": cg.einasto_density_profile(1.0e15, 800.0, 5.0),
    "einasto_mass": cg.einasto_mass_profile(1.0e15, 800.0, 5.0),
    "am06_density": cg.am06_density_profile(1.0e7, 600.0, 60.0, 0.17, 4.0),
    "vikhlinin_density": cg.vikhlinin_density_profile(1.0e7, 100.0, 1000.0, 1.0, 0.67, 3),
    "vikhlinin_temperature": cg.vikhlinin_temperature_profile(
        8.0, 0.1, 2.0, 1.0, 1000.0, 2.0, 50.0, 1.0),
    "am06_temperature": cg.am06_temperature_profile(8.0, 600.0, 60.0, 0.17),
    "baseline_entropy": cg.baseline_entropy_profile(10.0, 1000.0, 2000.0, 1.1),
    "broken_entropy": cg.broken_entropy_profile(500.0, 100.0, 1.1),
    "walker_entropy": cg.walker_entropy_profile(2000.0, 1.0, 1.2, 100.0),
}


@pytest.mark.parametrize("name", sorted(ALL_PROFILES))
def test_profile_instantiation(name):
    """Every profile evaluates finite and positive on the grid
    (reference test_radial_profiles.py:26-98)."""
    p = ALL_PROFILES[name]
    vals = np.asarray(p(jnp.asarray(RR)))
    assert vals.shape == RR.shape
    assert np.isfinite(vals).all(), name
    assert (vals > 0).all(), name


def test_operator_algebra():
    """+ * ** with profiles and scalars (reference :100-123)."""
    a = cg.nfw_density_profile(1.0e7, 500.0)
    b = cg.beta_model_profile(1.0e7, 100.0, 0.67)
    r = jnp.asarray(RR)
    av, bv = np.asarray(a(r)), np.asarray(b(r))
    assert np.allclose(np.asarray((a + b)(r)), av + bv)
    assert np.allclose(np.asarray((a * b)(r)), av * bv)
    assert np.allclose(np.asarray((2.0 * a)(r)), 2 * av)
    assert np.allclose(np.asarray((a + 1.0)(r)), av + 1)
    assert np.allclose(np.asarray((a**2)(r)), av**2)
    assert np.allclose(np.asarray((a - b)(r)), av - bv)
    assert np.allclose(np.asarray((a / b)(r)), av / bv)


def test_add_core_and_cutoff():
    a = cg.nfw_density_profile(1.0e7, 500.0)
    cored = a.add_core(50.0, 2.0)
    vals = np.asarray(cored(jnp.asarray(RR)))
    raw = np.asarray(a(jnp.asarray(RR)))
    assert (vals <= raw + 1e-30).all()
    assert vals[0] / raw[0] < 0.01  # suppressed at small radii
    cut = a.cutoff(1000.0, k=5)
    vc = np.asarray(cut(jnp.asarray(RR)))
    assert vc[-1] / raw[-1] < 1e-6  # killed beyond r_cut


@pytest.mark.parametrize("dens,mass", [
    ("hernquist_density", "hernquist_mass"),
    ("nfw_density", "nfw_mass"),
    ("tnfw_density", "tnfw_mass"),
    ("snfw_density", "snfw_mass"),
    ("cored_snfw_density", "cored_snfw_mass"),
    ("einasto_density", "einasto_mass"),
])
def test_mass_profiles_integrate_density(dens, mass):
    """Closed-form mass profiles equal 4 pi int rho r^2 dr
    (reference analytic Hernquist check :177-194, extended to the full
    density/mass pairs)."""
    d, m = ALL_PROFILES[dens], ALL_PROFILES[mass]
    for r in [10.0, 100.0, 1000.0, 5000.0]:
        numeric = float(mass_within(d, r, order=128))
        analytic = float(m(jnp.asarray([r]))[0])
        assert abs(numeric - analytic) / analytic < 1e-6, (dens, r)


def test_convert_nfw_to_hernquist():
    M0, a = cg.convert_nfw_to_hernquist(1.0e15, 2000.0, 5.0)
    # Hernquist M(<r200) should equal M200
    hm = cg.hernquist_mass_profile(M0, a)
    assert abs(float(hm(jnp.asarray([2000.0]))[0]) - 1.0e15) / 1.0e15 < 1e-10


def test_snfw_conc():
    assert float(cg.snfw_conc(4.0)) == pytest.approx(0.76 * 4.0 + 1.36)


def test_rescale_profile_by_mass():
    p = cg.vikhlinin_density_profile(1.0, 100.0, 1000.0, 1.0, 0.67, 3)
    scaled = cg.rescale_profile_by_mass(p, 1.0e14, 1000.0)
    got = float(mass_within(scaled, 1000.0))
    assert abs(got - 1.0e14) / 1.0e14 < 1e-8


def test_find_radius_mass_vs_scipy_bisect():
    from scipy.optimize import bisect

    Mt = cg.snfw_mass_profile(1.7e15, 550.0)
    r_mine, m_mine = cg.find_radius_mass(Mt, delta=500.0, z=0.1)
    cosmo = cg.default_cosmology()
    rho_c = float(cosmo.critical_density(0.1))
    f = lambda r: 3 * float(Mt(jnp.asarray([r]))[0]) / (4 * np.pi * r**3) \
        - 500.0 * rho_c
    r_ref = bisect(f, 0.01, 10000.0, xtol=1e-10)
    assert abs(float(r_mine) - r_ref) / r_ref < 1e-8


def test_find_overdensity_radius_roundtrip():
    r = cg.find_overdensity_radius(1.0e15, 200.0, z=0.0)
    cosmo = cg.default_cosmology()
    m_back = 4.0 / 3.0 * np.pi * float(r)**3 * 200.0 \
        * float(cosmo.critical_density(0.0))
    assert abs(m_back - 1.0e15) / 1.0e15 < 1e-12


def test_nfw_scale_density():
    rho_s = float(cg.nfw_scale_density(5.0, z=0.0))
    cosmo = cg.default_cosmology()
    rho_c = float(cosmo.critical_density(0.0))
    expected = 200.0 * rho_c * 125.0 / (np.log(6.0) - 5.0 / 6.0) / 3.0
    assert abs(rho_s - expected) / expected < 1e-12


def test_from_array_profile():
    r = np.logspace(0, 3, 100)
    v = 1.0 / r
    p = Profile.from_array(r, v)
    got = np.asarray(p(jnp.asarray([5.0, 50.0, 500.0])))
    assert np.allclose(got, [0.2, 0.02, 0.002], rtol=1e-5)


def test_profiles_vmappable():
    """Profiles vmap over parameter batches — the ensemble axis."""
    def build(rho_s, r_s):
        return cg.nfw_density_profile(rho_s, r_s)(jnp.asarray([100.0]))[0]

    rho = jnp.asarray([1e6, 2e6, 3e6])
    rs = jnp.asarray([300.0, 500.0, 700.0])
    out = jax.vmap(build)(rho, rs)
    assert out.shape == (3,)
    for i in range(3):
        expected = float(cg.nfw_density_profile(float(rho[i]), float(rs[i]))(
            jnp.asarray([100.0]))[0])
        assert abs(float(out[i]) - expected) / expected < 1e-12


def test_relations():
    assert 0.0 < float(cg.f_gas(1.0e15)) < 0.3
    assert float(cg.m_bcg(10**14.5)) == pytest.approx(10**12.15)
    assert float(cg.m_sat(10**14.5)) == pytest.approx(10**12.42)
    assert float(cg.r_bcg(10.0)) == pytest.approx(10**(-0.3))
    # ne <-> density is a consistent inverse pair
    from cluster_generator_tpu.core import units

    rho = units.ne_to_density(0.01)
    assert units.density_to_ne(rho) == pytest.approx(0.01)


def test_profiles_share_treedefs_no_retrace():
    """Rebuilding a profile (or the same composed expression) must not
    retrace jitted consumers: eval fns are module-level / cached, so
    pytree treedefs compare equal (once, every factory call minted a new
    closure and every host-side parameter loop recompiled the builders)."""
    import jax

    p1 = cg.beta_model_profile(1.0, 100.0, 0.67)
    p2 = cg.beta_model_profile(2.0, 150.0, 0.70)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)

    c1 = 2.0 * cg.snfw_density_profile(1e15, 500.0) \
        + cg.beta_model_profile(1.0, 100.0, 0.67) ** 2.0
    c2 = 3.0 * cg.snfw_density_profile(2e15, 400.0) \
        + cg.beta_model_profile(2.0, 90.0, 0.70) ** 2.0
    assert jax.tree_util.tree_structure(c1) == jax.tree_util.tree_structure(c2)

    traces = []

    @jax.jit
    def f(p, r):
        traces.append(1)
        return p(r)

    r = jnp.ones(8)
    f(p1, r), f(p2, r), f(c1, r), f(c2, r)
    assert len(traces) == 2  # one per distinct STRUCTURE, not per profile


def test_cored_snfw_mass_real_valued_both_branches():
    """The TPU-compilable real-valued cored-sNFW mass matches quadrature
    of the density on BOTH sides of b = a/r_c = 1 (the reference's
    complex128 arctan branch cannot compile on TPU)."""
    from scipy.integrate import quad

    M = 1.0e15
    for a, rc in [(500.0, 800.0), (500.0, 200.0),
                  (500.0, 499.0), (500.0, 501.0)]:
        dens = cg.cored_snfw_density_profile(M, a, rc)
        mass = cg.cored_snfw_mass_profile(M, a, rc)
        for r in (50.0, 500.0, 3000.0):
            mq = 4 * np.pi * quad(
                lambda s: float(np.asarray(dens(jnp.asarray([s])))[0])
                * s * s, 0, r, limit=300)[0]
            mv = float(np.asarray(mass(jnp.asarray([r])))[0])
            # the closed form's own b->1 cancellation bounds the error
            assert abs(mv - mq) / mq < 2e-6, (a, rc, r)
        import jax

        g = np.asarray(jax.grad(lambda rr: jnp.sum(mass(rr)))(
            jnp.asarray([100.0, 1000.0])))
        assert np.isfinite(g).all()
    # total-mass helper: the returned M parameter makes the enclosed
    # mass at `radius` equal the requested mass
    m_param = float(cg.cored_snfw_total_mass(M, 2000.0, 500.0, 200.0))
    enc = float(np.asarray(cg.cored_snfw_mass_profile(
        m_param, 500.0, 200.0)(jnp.asarray([2000.0])))[0])
    assert abs(enc - M) / M < 1e-10


def test_find_radius_mass_unbracketed_returns_nan():
    """Same-signed f at both bracket ends must not silently return a
    bracket endpoint (the reference's scipy.bisect raised there)."""
    # an (unphysical) enormous constant mass keeps f positive across the
    # whole bracket — no root inside [0.01, 10000] kpc
    silly = cg.Profile(lambda p, r: p * jnp.ones_like(r), 1.0e30)
    r, m = cg.find_radius_mass(silly, 500.0)
    assert np.isnan(float(r))
