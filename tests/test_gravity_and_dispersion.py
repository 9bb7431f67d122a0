"""Gravity extension point + Jeans velocity dispersion."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.interpolate import InterpolatedUnivariateSpline as IUS

import cluster_generator_tpu as cg
from cluster_generator_tpu.model.gravity import (
    aqual_field,
    emond_a0,
    emond_field,
    get_gravity,
    newtonian_field,
    qumond_field,
    register_gravity,
)


def test_registry():
    assert get_gravity("newtonian") is newtonian_field
    assert get_gravity("qumond") is qumond_field
    with pytest.raises(KeyError):
        get_gravity("nope")
    register_gravity("custom", lambda rr, m, p=None: rr * 0.0)
    assert get_gravity("custom") is not None


def test_newtonian_matches_model(canonical_model):
    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    g = np.asarray(newtonian_field(rr, m))
    assert np.allclose(g, np.asarray(canonical_model["gravitational_field"]),
                       rtol=1e-12)


def test_qumond_stronger_in_weak_field(canonical_model):
    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    g_n = np.asarray(newtonian_field(rr, m))
    g_q = np.asarray(qumond_field(rr, m))
    # |g_qumond| > |g_newton| everywhere; boost grows with radius
    assert (np.abs(g_q) > np.abs(g_n)).all()
    boost = np.abs(g_q / g_n)
    assert boost[-1] > boost[0]


def test_aqual_closed_form_and_limits(canonical_model):
    """The spherical AQUAL inversion must satisfy mu(x) x = y exactly
    (mu(x) = x/(1+x), the reference config's AQUAL lambda) and approach
    Newton in the strong field / sqrt(g_N a0) in the deep-MOND limit."""
    from cluster_generator_tpu.core import constants as C
    from cluster_generator_tpu.core.config import cgparams

    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    a0 = (cgparams["gravity"]["mond"]["a0_m_s2"]
          * C.MYR_S**2 / C.KPC_M)
    g_n = np.asarray(newtonian_field(rr, m))
    g_a = np.asarray(aqual_field(rr, m))
    x, y = np.abs(g_a) / a0, np.abs(g_n) / a0
    np.testing.assert_allclose(x * (x / (1.0 + x)), y, rtol=1e-12)
    assert (np.abs(g_a) > np.abs(g_n)).all()
    # the MOND boost x/y = (1 + sqrt(1 + 4/y))/2 grows outward (weaker
    # field); exact at both ends
    boost = np.abs(g_a / g_n)
    np.testing.assert_allclose(boost, 0.5 * (1.0 + np.sqrt(1.0 + 4.0 / y)),
                               rtol=1e-12)
    assert boost[-1] > boost[0] > 1.0
    # weak-field end: deep-MOND asymptote sqrt(g_N a0) plus an O(g_N)
    # correction (x = sqrt(y) + y/2 + O(y^1.5) for small y)
    deep = np.sqrt(np.abs(g_n[-1]) * a0)
    assert deep < np.abs(g_a[-1]) < deep + np.abs(g_n[-1])


def test_emond_a0_and_field(canonical_model):
    """EMOND's A0(phi): -> a0 in shallow potentials, -> (A/a) a0 in deep
    ones, monotone in |phi| ((a+A)/2 at the p0 scale), and emond_field
    demands phi.  The reference's config lambda writes the shape as
    log10(x/p0)**2 (exponent outside the log) which is non-monotonic
    and never reduces to a0 — this rebuild fixes it to the
    log-of-square literature form (gravity.emond_a0 docstring)."""
    from cluster_generator_tpu.core import constants as C

    to_units = (C.KPC_M / C.MYR_S / 1.0e5) ** 2  # kpc^2/Myr^2 -> (100km/s)^2
    phi_p0 = -7.614 / to_units
    a0_gal = 1.2e-10 * C.MYR_S**2 / C.KPC_M
    a0_at_p0 = float(emond_a0(phi_p0))
    # at phi = p0 the tanh argument is 0 -> A0 = (a + A)/2 scaled
    assert abs(a0_at_p0 / a0_gal
               - 0.5 * (0.003868 + 0.30944) / 0.003868) < 1e-6
    # shallow potential: standard MOND recovered (A0 -> a0)
    base = float(emond_a0(phi_p0 * 1e-12))
    assert abs(base / a0_gal - 1.0) < 1e-3
    # deep potential: full EMOND boost A0 -> (A/a) a0 (~80x)
    deep = float(emond_a0(phi_p0 * 1e12))
    assert abs(deep / a0_gal - 0.30944 / 0.003868) < 1e-3
    # monotone non-decreasing in |phi|
    sweep = np.asarray(emond_a0(phi_p0 * np.logspace(-6, 6, 121)))
    assert (np.diff(sweep) >= -1e-12 * a0_gal).all()

    rr = jnp.asarray(canonical_model["radius"])
    m = jnp.asarray(canonical_model["total_mass"])
    phi = jnp.asarray(canonical_model["gravitational_potential"])
    g_e = np.asarray(emond_field(rr, m, {"phi": phi}))
    g_n = np.asarray(newtonian_field(rr, m))
    assert np.isfinite(g_e).all() and (np.abs(g_e) > np.abs(g_n)).all()
    with pytest.raises(ValueError, match="phi"):
        emond_field(rr, m)
    assert get_gravity("aqual") is aqual_field
    assert get_gravity("emond") is emond_field
    # A0 is EVEN in phi (log of the SQUARE): the psi = -Phi sign
    # convention used throughout the codebase must give identical
    # values, not silently collapse to the shallow-potential limit
    np.testing.assert_allclose(np.asarray(emond_a0(-phi)),
                               np.asarray(emond_a0(phi)), rtol=0)


def test_velocity_dispersion_jeans(canonical_model):
    sigma = canonical_model.compute_velocity_dispersion("dark_matter")
    assert (sigma >= 0).all() and np.isfinite(sigma).all()
    # r_a <= 0 would silently NaN-poison the stored field; validated
    # like the other two r_a entry points
    for bad in (0.0, -500.0):
        with pytest.raises(ValueError, match="r_a"):
            canonical_model.compute_velocity_dispersion("dark_matter",
                                                        r_a=bad)
    # scipy cross-check at a few radii
    rr = np.asarray(canonical_model["radius"])
    rho = IUS(rr, np.asarray(canonical_model["dark_matter_density"]))
    g = IUS(rr, np.asarray(canonical_model["gravitational_field"]))
    for i in [100, 400, 700]:
        val = quad(lambda r: rho(r) * (-g(r)), rr[i], rr[-1], limit=200)[0]
        ref = np.sqrt(val / rho(rr[i]))
        assert abs(sigma[i] - ref) / ref < 1e-6
    # enables RadialRandomVelocityField straight from the model
    f = cg.RadialRandomVelocityField([0] * 3, [1000.0] * 3, [16] * 3, 100.0,
                                     500.0, [500.0] * 3, canonical_model,
                                     prng=1)
    assert np.isfinite(f["velocity_x"]).all()


# ------------------------------------------------------------------
# End-to-end MOND clusters: the registry wired into the constructors
# (reference docs/source/models.rst:75-123, bin/config.yaml:34-51)
# ------------------------------------------------------------------

def _small_profiles(canonical_profiles):
    return (canonical_profiles["rhog"], canonical_profiles["rhot"])


@pytest.mark.slow
def test_aqual_cluster_end_to_end(canonical_profiles, tmp_path):
    """An AQUAL cluster builds from matter profiles, HSE-checks, carries
    the field-integrated potential, inverts back to the matter mass via
    from_dens_and_temp, samples DM particles bounded by the MOND v_esc,
    and round-trips its law through HDF5."""
    from cluster_generator_tpu.model.gravity import aqual_field
    from cluster_generator_tpu.profiles.algebra import RadialProfile

    rhog, rhot = _small_profiles(canonical_profiles)
    kw = dict(num_points=300)
    mN = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot, **kw)
    mA = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                            gravity="aqual", **kw)
    assert mA.gravity == "aqual" and mN.gravity == "newtonian"
    rr = np.asarray(mA["radius"])

    # matter mass is the law-independent input; the field is boosted
    np.testing.assert_allclose(mA["total_mass"], mN["total_mass"],
                               rtol=1e-12)
    g_a = np.asarray(mA["gravitational_field"])
    np.testing.assert_allclose(
        g_a, np.asarray(aqual_field(jnp.asarray(rr),
                                    jnp.asarray(mA["total_mass"]))),
        rtol=1e-12)
    assert (np.abs(g_a) > np.abs(np.asarray(mN["gravitational_field"]))).all()

    # HSE holds by construction under the law's own field
    assert np.abs(np.asarray(mA.check_hse())[2:-2]).max() < 1e-4

    # potential integrates the FIELD: dPhi/dr = -g (interior points;
    # spline-differentiate the stored potential)
    phi_sp = IUS(rr, np.asarray(mA["gravitational_potential"]))
    dphi = phi_sp.derivative()(rr[5:-5])
    np.testing.assert_allclose(dphi, -g_a[5:-5], rtol=2e-5)
    # MOND potential well is deeper than the Newtonian one at rmax
    assert (mA["gravitational_potential"][-1]
            < mN["gravitational_potential"][-1])

    # inverse wiring: from_dens_and_temp under the same law recovers
    # the matter mass (round-trip through the HSE field)
    tprof = RadialProfile.from_array(rr, np.asarray(mA["temperature"]))
    dprof = RadialProfile.from_array(rr, np.asarray(mA["density"]))
    mA2 = cg.ClusterModel.from_dens_and_temp(0.1, 10000.0, dprof, tprof,
                                             gravity="aqual", **kw)
    rel = np.abs(np.asarray(mA2["total_mass"]) - np.asarray(mA["total_mass"])
                 ) / np.asarray(mA["total_mass"])
    # floor is the from_array spline resolution at 300 grid points
    # (the same check at num_points=1000 reaches ~2e-7 interior max)
    assert np.median(rel) < 1e-7 and rel[5:-5].max() < 1e-4

    # and WITHOUT the law it infers more (phantom) mass than the matter
    mWrong = cg.ClusterModel.from_dens_and_temp(0.1, 10000.0, dprof, tprof,
                                                **kw)
    assert (np.asarray(mWrong["total_mass"])[10:]
            > 1.05 * np.asarray(mA["total_mass"])[10:]).all()

    # Newtonian limit: a0 -> 0 makes every x huge, mu -> 1
    mLim = cg.ClusterModel.from_dens_and_tden(
        0.1, 10000.0, rhog, rhot, gravity="aqual",
        gravity_params={"a0_m_s2": 1e-22}, **kw)
    np.testing.assert_allclose(mLim["gravitational_field"],
                               mN["gravitational_field"], rtol=1e-5)

    # deep-MOND asymptote: a0 huge -> |g| = sqrt(G M a0) / r
    from cluster_generator_tpu.core import constants as C

    a0_big_si = 1.2e-4
    a0_big = a0_big_si * C.MYR_S**2 / C.KPC_M
    mDeep = cg.ClusterModel.from_dens_and_tden(
        0.1, 10000.0, rhog, rhot, gravity="aqual",
        gravity_params={"a0_m_s2": a0_big_si}, **kw)
    expect = -np.sqrt(C.G * np.asarray(mDeep["total_mass"]) * a0_big) / rr
    # x = sqrt(y) (1 + sqrt(y)/2 + ...): the leading correction at this
    # a0 is ~1.2e-3 of the asymptote at the strongest-field point
    np.testing.assert_allclose(mDeep["gravitational_field"], expect,
                               rtol=3e-3)

    # particles: draws bounded by the MOND escape speed
    p = mA.generate_dm_particles(5000, prng=7)
    pos = np.asarray(p["dm", "particle_position"])
    vel = np.asarray(p["dm", "particle_velocity"])
    r_p = np.sqrt((pos ** 2).sum(axis=1))
    psi = -np.asarray(mA["gravitational_potential"])
    v_esc = np.sqrt(2.0 * np.interp(r_p, rr, psi))
    v = np.sqrt((vel ** 2).sum(axis=1))
    assert (v <= v_esc * (1 + 1e-12)).all()
    assert np.asarray(mA.dm_virial.df).min() >= 0.0

    # HDF5 round-trip carries the law
    fn = str(tmp_path / "aqual.h5")
    mA.write_model_to_h5(fn)
    back = cg.ClusterModel.from_h5_file(fn)
    assert back.gravity == "aqual"
    np.testing.assert_allclose(back["gravitational_field"], g_a, rtol=1e-12)


def test_qumond_equals_aqual_spherical(canonical_profiles):
    """For the simple interpolation pair the spherical QUMOND and AQUAL
    constructions coincide exactly (nu(y) y inverts mu(x) x = y):
    one closed form serves both constructor paths."""
    rhog, rhot = _small_profiles(canonical_profiles)
    kw = dict(num_points=200)
    mq = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                            gravity="qumond", **kw)
    ma = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                            gravity="aqual", **kw)
    for k in ("gravitational_field", "pressure", "temperature",
              "gravitational_potential", "total_mass"):
        np.testing.assert_allclose(mq[k], ma[k], rtol=1e-12, err_msg=k)
    assert mq.gravity == "qumond"


def test_emond_cluster_end_to_end(canonical_profiles):
    """EMOND: the fixed point A0(phi(g)) converges (the stored field is
    self-consistent), boosts beyond AQUAL in the deep cluster potential,
    and reduces exactly to AQUAL when A = a."""
    from cluster_generator_tpu.model.builders import potential_from_field
    from cluster_generator_tpu.model.gravity import field_for_law

    rhog, rhot = _small_profiles(canonical_profiles)
    kw = dict(num_points=200)
    me = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                            gravity="emond", **kw)
    ma = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                            gravity="aqual", **kw)
    rr = jnp.asarray(me["radius"])
    g = jnp.asarray(me["gravitational_field"])
    m = jnp.asarray(me["total_mass"])
    # self-consistency: one more fixed-point sweep is a no-op
    phi = potential_from_field(rr, g)
    np.testing.assert_allclose(np.asarray(me["gravitational_potential"]),
                               np.asarray(phi), rtol=1e-10)
    g_next = field_for_law(rr, m, "emond", phi=phi)
    np.testing.assert_allclose(np.asarray(g_next), np.asarray(g), rtol=1e-10)
    # cluster potentials are deep: EMOND's A0 > a0 -> stronger boost
    assert (np.abs(np.asarray(me["gravitational_field"]))
            >= np.abs(np.asarray(ma["gravitational_field"])) * (1 - 1e-12)).all()
    assert me.check_hse() is not None
    # A = a freezes A0 at a0: EMOND degenerates to AQUAL exactly
    mfroz = cg.ClusterModel.from_dens_and_tden(
        0.1, 10000.0, rhog, rhot, gravity="emond",
        gravity_params={"A": 0.003868}, **kw)
    np.testing.assert_allclose(mfroz["gravitational_field"],
                               ma["gravitational_field"], rtol=1e-10)


def test_no_gas_and_dynamical_mass_errors(canonical_profiles):
    from cluster_generator_tpu.model.gravity import dynamical_mass

    rhot = canonical_profiles["rhot"]
    mn = cg.ClusterModel.no_gas(1.0, 5000.0, rhot, num_points=150)
    ma = cg.ClusterModel.no_gas(1.0, 5000.0, rhot, num_points=150,
                                gravity="aqual")
    np.testing.assert_allclose(ma["total_mass"], mn["total_mass"],
                               rtol=1e-12)
    assert (np.abs(np.asarray(ma["gravitational_field"]))
            > np.abs(np.asarray(mn["gravitational_field"]))).all()
    rr = jnp.asarray(mn["radius"])
    g = jnp.asarray(mn["gravitational_field"])
    with pytest.raises(KeyError, match="Unknown gravity"):
        dynamical_mass(rr, g, "nope")
    with pytest.raises(ValueError, match="phi"):
        dynamical_mass(rr, g, "emond")
    # newtonian inversion reproduces the input mass
    np.testing.assert_allclose(np.asarray(dynamical_mass(rr, g)),
                               np.asarray(mn["total_mass"]), rtol=1e-12)


@pytest.mark.slow
def test_mond_datagen_catalogs(tmp_path):
    """The gravity law threaded through the DATAGEN products: catalogs
    record the law, the QA gates rebuild under it, a mislabeled catalog
    fails loudly (MOND draws exceed the Newtonian escape speed), resume
    refuses to splice across a law change, and the merger product
    carries the same knob."""
    import h5py
    import jax

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        merger_datagen,
        sample_ensemble_params,
        sample_merger_scene_params,
        verify_catalog,
        verify_merger_catalog,
    )

    M, c = sample_ensemble_params(jax.random.key(5), 3)
    fn = str(tmp_path / "aqual_cat.h5")
    kw = dict(batch_size=2, num_points=128, key=jax.random.key(12))
    ensemble_datagen(M, c, fn, {"dm": 20_000, "gas": 10_000}, gravity="aqual",
                     **kw)
    with h5py.File(fn) as f:
        assert f.attrs["gravity"] == "aqual"
    report = verify_catalog(fn)
    assert report["violations"] == []

    # mislabeled as Newtonian: the rebuild under the wrong law must fire
    # (deeper MOND potential -> draws exceed the Newtonian v_esc, and
    # the gas energies don't match the Newtonian HSE temperature)
    with h5py.File(fn, "a") as f:
        f.attrs["gravity"] = "newtonian"
    bad = verify_catalog(fn, strict=False)
    assert bad["violations"], "mislabeled MOND catalog passed the QA gate"

    # resume across a law change refuses to splice
    with h5py.File(fn, "a") as f:
        f.attrs["gravity"] = "aqual"
        del f.attrs["complete"]
        del f["cluster_000002"]
    with pytest.raises(ValueError, match="gravity"):
        ensemble_datagen(M, c, fn, {"dm": 20_000, "gas": 10_000},
                         resume=True, **kw)
    ensemble_datagen(M, c, fn, {"dm": 20_000, "gas": 10_000},
                     gravity="aqual", resume=True, **kw)
    assert verify_catalog(fn)["violations"] == []

    # unknown law names fail fast, before any compile
    with pytest.raises(KeyError, match="Unknown gravity"):
        ensemble_datagen(M, c, str(tmp_path / "x.h5"), {"dm": 100},
                         gravity="mondish", **kw)

    # merger product: same knob, same gate
    p = sample_merger_scene_params(jax.random.key(3), 2)
    mfn = str(tmp_path / "aqual_mergers.h5")
    merger_datagen(p, mfn, counts={"dm": 4000, "gas": 3000},
                   batch_size=2, num_points=128, key=jax.random.key(4),
                   gravity="qumond")
    with h5py.File(mfn) as f:
        assert f.attrs["gravity"] == "qumond"
    assert verify_merger_catalog(mfn)["violations"] == []
