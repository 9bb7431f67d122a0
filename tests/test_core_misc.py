"""Direct coverage for core/scan_ops, core/cosmology, core/config,
core/units conversions."""

import jax.numpy as jnp
import numpy as np
import pytest

from cluster_generator_tpu.core import units
from cluster_generator_tpu.core.config import defaults, load_config
from cluster_generator_tpu.core.cosmology import Cosmology, default_cosmology
from cluster_generator_tpu.core.scan_ops import cumsum


def test_cumsum_matches_numpy_1d_2d():
    rng = np.random.RandomState(0)
    x = rng.rand(1000)
    assert np.allclose(np.asarray(cumsum(jnp.asarray(x))), np.cumsum(x),
                       rtol=1e-12)
    y = rng.rand(7, 513)
    assert np.allclose(np.asarray(cumsum(jnp.asarray(y), axis=1)),
                       np.cumsum(y, axis=1), rtol=1e-12)
    assert np.allclose(np.asarray(cumsum(jnp.asarray(y), axis=0)),
                       np.cumsum(y, axis=0), rtol=1e-12)


def test_cumsum_large_assoc_scan_path():
    x = np.ones(10_000)
    got = np.asarray(cumsum(jnp.asarray(x)))
    assert got[-1] == pytest.approx(10_000.0)
    assert np.allclose(got, np.arange(1, 10_001))


def test_cosmology_critical_density():
    cosmo = default_cosmology()
    # rho_crit(0) for h=0.71: ~139.9 Msun/kpc^3
    rc = float(cosmo.critical_density(0.0))
    assert 130.0 < rc < 150.0
    # E(z) scaling
    rc1 = float(cosmo.critical_density(1.0))
    E2 = 0.27 * 8 + 0.73
    assert rc1 / rc == pytest.approx(E2, rel=1e-12)
    # custom cosmology
    c2 = Cosmology(hubble_constant=0.7, omega_matter=0.3, omega_lambda=0.7)
    assert float(c2.critical_density(0.0)) < rc * 1.05


def test_config_override(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("physics:\n  hydrogen_abundance: 0.75\n")
    cfg = load_config(str(p))
    assert cfg["physics"]["hydrogen_abundance"] == 0.75
    # untouched keys keep defaults (deep merge)
    assert cfg["system"]["logging"]["main"]["level"] == \
        defaults["system"]["logging"]["main"]["level"]
    # no file -> pure defaults
    assert load_config(None)["physics"]["hydrogen_abundance"] == 0.76


def test_unit_roundtrips():
    for unit in ["km/s", "g/cm**3", "Msun", "cm", "Gyr", "erg/cm**3",
                 "km**2/s**2"]:
        v = units.to_galactic(3.7, unit)
        back = units.from_galactic(v, unit)
        assert back == pytest.approx(3.7, rel=1e-12), unit
    # physical spot checks
    assert units.to_galactic(1.0, "km/s") == pytest.approx(1.0227e-3,
                                                           rel=1e-3)
    assert units.galactic_to_cgs_factor("density") == pytest.approx(
        6.77e-32, rel=1e-2)
    assert units.keV_to_K(1.0) == pytest.approx(1.1605e7, rel=1e-3)
    assert units.K_to_keV(units.keV_to_K(2.5)) == pytest.approx(2.5)


def test_units_boundary_conversions_and_refusals():
    """The unit boundary (core/units.py): same-dimension conversions are
    exact, dimension mismatches raise, native-unit families refuse
    cross-family conversions (K->keV requires the explicit thermal
    equivalence), and the thermal equivalence round-trips."""
    import pytest as _pytest

    from cluster_generator_tpu.core import units as U

    # galactic-base conversions
    np.testing.assert_allclose(U.to_field_units(1.0, "Mpc", "radius"),
                               1000.0)
    np.testing.assert_allclose(
        U.to_field_units(1.0, "g/cm**3", "density"),
        U.unit_factor("g/cm**3") / U.unit_factor("Msun/kpc**3"))
    # dimension mismatch refused
    with _pytest.raises(ValueError):
        U.to_field_units(1.0, "Msun", "radius")
    # unknown unit refused with a registration hint
    with _pytest.raises(KeyError):
        U.unit_factor("furlong")
    # native keV family: Kelvin refused, keV accepted
    with _pytest.raises(ValueError):
        U.to_field_units(1.0e7, "K", "temperature")
    np.testing.assert_allclose(
        U.to_field_units(5.0, "keV", "temperature"), 5.0)
    # gauss family accepts microgauss
    np.testing.assert_allclose(
        U.to_field_units(1.0, "uG", "magnetic_field_strength"), 1.0e-6)
    # thermal equivalence round-trip
    np.testing.assert_allclose(U.K_to_keV(U.keV_to_K(3.2)), 3.2,
                               rtol=1e-12)
    # ~1 keV is ~1.16e7 K (physical sanity)
    assert 1.15e7 < float(U.keV_to_K(1.0)) < 1.17e7
