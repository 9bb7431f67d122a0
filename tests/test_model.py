"""ClusterModel: golden parity vs a scipy reimplementation of the reference
math, physics invariants, constructors, I/O (reference tests/test_models.py)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.interpolate import InterpolatedUnivariateSpline as IUS

import cluster_generator_tpu as cg
from cluster_generator_tpu.core import constants as C
from cluster_generator_tpu.core import units


def _np_profile(p):
    return lambda r: np.asarray(p(jnp.asarray(np.atleast_1d(r))))


def test_hse_residual(canonical_model):
    """HSE deviation < 1e-4 (reference test_models.py:99-114)."""
    dev = canonical_model.check_hse()
    assert np.all(np.abs(dev) < 1.0e-4), np.abs(dev).max()


def test_field_parity_vs_scipy(canonical_model, canonical_profiles):
    """total/gas mass, g, pressure, temperature vs the reference algorithm
    reimplemented with scipy.quad + splines (model.py:565-618)."""
    m = canonical_model
    rr = np.asarray(m["radius"])
    rhog = _np_profile(canonical_profiles["rhog"])
    rhot = _np_profile(canonical_profiles["rhot"])

    idx = np.unique(np.linspace(0, rr.size - 1, 40).astype(int))
    mt_ref = np.array([4 * np.pi * quad(lambda r: float(rhot(r)[0]) * r * r,
                                        0, rr[i], limit=200)[0] for i in idx])
    rel = np.abs(np.asarray(m["total_mass"])[idx] - mt_ref) / mt_ref
    assert rel.max() < 1e-7, rel.max()

    mg_ref = np.array([4 * np.pi * quad(lambda r: float(rhog(r)[0]) * r * r,
                                        0, rr[i], limit=200)[0] for i in idx])
    rel = np.abs(np.asarray(m["gas_mass"])[idx] - mg_ref) / mg_ref
    assert rel.max() < 1e-7, rel.max()

    g_ref = -C.G * mt_ref / rr[idx] ** 2
    rel = np.abs(np.asarray(m["gravitational_field"])[idx] - g_ref) / np.abs(g_ref)
    assert rel.max() < 1e-7

    # pressure: scipy route with the same spline-of-g algorithm
    g_all = np.asarray(m["gravitational_field"])
    g_sp = IUS(rr, g_all)
    dPdr = lambda r: float(rhog(r)[0]) * float(g_sp(r))
    P_ref = np.array([quad(dPdr, rr[i], rr[-1], limit=200)[0] for i in idx])
    P_ref = -P_ref
    tail = quad(lambda r: float(rhog(r)[0]) * g_all[-1] * (rr[-1] / r) ** 2,
                rr[-1], np.inf, limit=200)[0]
    P_ref -= tail
    rel = np.abs(np.asarray(m["pressure"])[idx] - P_ref) / P_ref
    assert rel.max() < 1e-6, rel.max()

    # temperature consistency: T = P mu mp / rho (in keV)
    T = np.asarray(m["temperature"])
    T_ref = np.asarray(m["pressure"]) * C.mu * C.mp / np.asarray(m["density"]) / C.keV
    assert np.allclose(T, T_ref, rtol=1e-12)
    assert 1.0 < T.max() < 30.0  # physically sensible keV range


def test_potential_parity(canonical_model):
    """Phi = -G (M/r + 4 pi int_r^rmax rho_t r dr) (model.py:220-226)."""
    m = canonical_model
    rr = np.asarray(m["radius"])
    tdens = IUS(rr, np.asarray(m["total_density"]))
    idx = np.unique(np.linspace(0, rr.size - 1, 20).astype(int))
    pot_ref = np.empty(idx.size)
    for k, i in enumerate(idx):
        g2 = quad(lambda r: tdens(r) * r, rr[i], rr[-1], limit=200)[0]
        pot_ref[k] = -C.G * (np.asarray(m["total_mass"])[i] / rr[i]
                             + 4 * np.pi * g2)
    got = np.asarray(m["gravitational_potential"])[idx]
    assert np.abs((got - pot_ref) / pot_ref).max() < 1e-6


def test_secondary_fields(canonical_model):
    m = canonical_model
    # entropy = T n_e^{-2/3}
    S = np.asarray(m["entropy"])
    S_ref = np.asarray(m["temperature"]) * np.asarray(
        m["electron_number_density"]) ** (-2.0 / 3.0)
    assert np.allclose(S, S_ref, rtol=1e-12)
    fg = np.asarray(m["gas_fraction"])
    assert ((fg > 0) & (fg < 1)).all()
    # DM = total - gas - stars where positive
    dd = np.asarray(m["total_density"]) - np.asarray(m["density"]) \
        - np.asarray(m["stellar_density"])
    mask = dd > 0
    assert np.allclose(np.asarray(m["dark_matter_density"])[mask], dd[mask],
                       rtol=1e-12)


def test_from_dens_and_temp_consistency(canonical_model, canonical_profiles):
    """Rebuilding from (rho, T(r)) recovers the same total mass profile."""
    m = canonical_model
    rr = np.asarray(m["radius"])
    temp_profile = cg.Profile.from_array(rr, np.asarray(m["temperature"]))
    m2 = cg.ClusterModel.from_dens_and_temp(
        rr[0], rr[-1], canonical_profiles["rhog"], temp_profile,
        num_points=rr.size)
    # derivative-based reconstruction is inherently less accurate; compare
    # away from the grid ends
    sl = slice(50, -50)
    rel = np.abs(np.asarray(m2["total_mass"])[sl]
                 - np.asarray(m["total_mass"])[sl]) \
        / np.asarray(m["total_mass"])[sl]
    assert np.median(rel) < 2e-3, np.median(rel)


def test_from_dens_and_entr_consistency(canonical_model, canonical_profiles):
    m = canonical_model
    rr = np.asarray(m["radius"])
    entr_profile = cg.Profile.from_array(rr, np.asarray(m["entropy"]))
    m2 = cg.ClusterModel.from_dens_and_entr(
        rr[0], rr[-1], canonical_profiles["rhog"], entr_profile,
        num_points=rr.size)
    sl = slice(5, -5)
    rel = np.abs(np.asarray(m2["temperature"])[sl]
                 - np.asarray(m["temperature"])[sl]) \
        / np.asarray(m["temperature"])[sl]
    assert np.median(rel) < 1e-4


def test_no_gas(canonical_profiles):
    m = cg.ClusterModel.no_gas(0.1, 1.0e4, canonical_profiles["rhot"],
                               stellar_density=canonical_profiles["rhos"])
    assert "density" not in m
    assert "total_mass" in m and "dark_matter_mass" in m
    assert (np.asarray(m["dark_matter_density"]) >= 0).all()


def test_magnetic_field_from_beta(canonical_model):
    """B^2/8pi == P/beta in cgs, for each beta (reference :150-176)."""
    m = canonical_model
    for beta in [1.0, 10.0, 100.0]:
        m.set_magnetic_field_from_beta(beta, gaussian=True)
        B = np.asarray(m["magnetic_field_strength"])
        p_cgs = np.asarray(m["pressure"]) * units.galactic_to_cgs_factor("pressure")
        assert np.allclose(B**2 / (8 * np.pi), p_cgs / beta, rtol=1e-12)
    m.set_magnetic_field_from_beta(100.0, gaussian=True)


def test_magnetic_field_from_density(canonical_model):
    m = canonical_model
    m.set_magnetic_field_from_density(1.0e-6, eta=2.0 / 3.0)
    B = np.asarray(m["magnetic_field_strength"])
    rho = np.asarray(m["density"])
    assert B[0] == pytest.approx(1.0e-6)
    assert np.allclose(B, 1e-6 * (rho / rho[0]) ** (2.0 / 3.0), rtol=1e-12)
    m.set_magnetic_field_from_beta(100.0, gaussian=True)


def test_h5_roundtrip(canonical_model, tmp_path):
    """HDF5 write/read preserves fields + resumes DFs (model.py:148-211)."""
    fn = str(tmp_path / "model.h5")
    m = canonical_model
    _ = m.dm_virial  # ensure DF computed
    m.write_model_to_h5(fn)
    m2 = cg.ClusterModel.from_h5_file(fn)
    for k in m.keys():
        assert np.allclose(m[k], np.asarray(m2[k]), rtol=1e-12), k
    assert m2._dm_virial is not None
    assert np.allclose(m2.dm_virial.df, m.dm_virial.df)


def test_h5_cgs_roundtrip(canonical_model, tmp_path):
    fn = str(tmp_path / "model_cgs.h5")
    canonical_model.write_model_to_h5(fn, in_cgs=True)
    m2 = cg.ClusterModel.from_h5_file(fn)
    for k in ["density", "total_mass", "pressure", "temperature"]:
        assert np.allclose(canonical_model[k], np.asarray(m2[k]),
                           rtol=1e-10), k


def test_h5_rmin_rmax_mask(canonical_model, tmp_path):
    fn = str(tmp_path / "model_mask.h5")
    canonical_model.write_model_to_h5(fn, r_min=1.0, r_max=1000.0)
    m2 = cg.ClusterModel.from_h5_file(fn)
    rr = np.asarray(m2["radius"])
    assert rr[0] >= 1.0 and rr[-1] <= 1000.0
    assert m2.num_elements < canonical_model.num_elements


def test_ascii_and_binary_writers(canonical_model, tmp_path):
    fa = str(tmp_path / "model.dat")
    canonical_model.write_model_to_ascii(fa)
    data = _read_ecsv_data(fa)
    assert data.shape[0] == canonical_model.num_elements


def _read_ecsv_data(fa):
    lines = open(fa).read().splitlines()
    first_data = next(i for i, ln in enumerate(lines)
                      if not ln.startswith("#")) + 1  # + names row
    return np.loadtxt(fa, skiprows=first_data)


def test_ascii_is_valid_ecsv(canonical_model, tmp_path):
    """The ASCII writer emits ECSV 1.0 (the format the reference's
    QTable.write produces, model.py:307-340): validate the YAML header
    structure + column/units round-trip without astropy, and with real
    astropy when the environment has it."""
    import yaml

    fa = str(tmp_path / "model.ecsv")
    canonical_model.write_model_to_ascii(fa)
    lines = open(fa).read().splitlines()
    assert lines[0] == "# %ECSV 1.0"
    header_yaml = "\n".join(ln[2:] for ln in lines[1:]
                            if ln.startswith("# "))
    header = yaml.safe_load(header_yaml)
    names = [c["name"] for c in header["datatype"]]
    assert set(names) == set(canonical_model.fields.keys())
    units_by_name = {c["name"]: c.get("unit", "") for c in header["datatype"]}
    assert units_by_name["density"] == "Msun/kpc**3"
    assert units_by_name["magnetic_field_strength"] == "G"
    # column names row then data
    name_row = next(ln for ln in lines if not ln.startswith("#"))
    assert name_row.split() == names
    data = _read_ecsv_data(fa)
    assert data.shape == (canonical_model.num_elements, len(names))
    assert np.allclose(data[:, names.index("radius")],
                       np.asarray(canonical_model["radius"]), rtol=1e-12)

    try:
        from astropy.table import QTable
    except ImportError:
        return  # structural validation above is the in-image guarantee
    t = QTable.read(fa)
    assert t.colnames == names
    assert str(t["radius"].unit) == "kpc"


def test_binary_writer_fortran_records(canonical_model, tmp_path):
    """write_model_to_binary emits Fortran records with the requested
    fields in cgs (reference model.py:342-365)."""
    fb = str(tmp_path / "model.bin")
    canonical_model.write_model_to_binary(
        fb, fields_to_write=["radius", "density", "pressure"], in_cgs=True)
    from scipy.io import FortranFile

    with FortranFile(fb, "r") as f:
        n = f.read_ints()[0]
        rec = f.read_reals().reshape(n, 3)
    assert n == canonical_model.num_elements
    assert np.allclose(rec[:, 0], np.asarray(canonical_model["radius"])
                       * units.galactic_to_cgs_factor("radius"), rtol=1e-12)


def test_overwrite_refusal(canonical_model, tmp_path):
    fn = str(tmp_path / "model.h5")
    canonical_model.write_model_to_h5(fn)
    with pytest.raises(IOError):
        canonical_model.write_model_to_h5(fn)


def test_set_rmax_and_lookups(canonical_model):
    m = canonical_model
    trunc = m.set_rmax(1000.0)
    assert np.asarray(trunc["radius"])[-1] <= 1000.0
    masses = m.mass_in_radius(1000.0)
    assert set(masses) == {"total", "gas", "dark_matter", "stellar"}
    assert masses["total"] > masses["gas"]
    v = m.find_field_at_radius("density", 500.0)
    lo = np.interp(500.0, np.asarray(m["radius"]), np.asarray(m["density"]))
    assert v == pytest.approx(lo)
    r = m.find_radius_for_density(lo)
    assert r == pytest.approx(500.0, rel=1e-3)


def test_from_arrays(canonical_model):
    m2 = cg.ClusterModel.from_arrays(dict(canonical_model.fields))
    assert m2.num_elements == canonical_model.num_elements


@pytest.mark.slow
def test_4096_point_grid():
    """BASELINE config 1: high-resolution grid improves HSE residual ~10x."""
    rhog = cg.rescale_profile_by_mass(
        cg.vikhlinin_density_profile(1.0, 100.0, 1200.0, 1.0, 0.67, 3),
        1e14, 1000.0)
    rhot = cg.nfw_density_profile(float(cg.nfw_scale_density(5.0)), 450.0)
    m = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                           num_points=4096)
    assert np.abs(m.check_hse()).max() < 1e-5
    assert m.check_dm_virial()[1].max() < 1e-4


def test_am06_pair():
    """AM06 density+temperature pair (reference docs' canonical cool-core
    model) builds at machine-precision HSE consistency."""
    rho0 = cg.rescale_profile_by_mass(
        cg.am06_density_profile(1.0, 600.0, 60.0, 0.17, 4.0), 5e13, 1000.0)
    T = cg.am06_temperature_profile(8.0, 600.0, 60.0, 0.17)
    m = cg.ClusterModel.from_dens_and_temp(0.5, 5000.0, rho0, T,
                                           num_points=1000)
    assert np.abs(m.check_hse()).max() < 1e-10
    Tv = np.asarray(m["temperature"])
    assert 0.5 < Tv.min() and Tv.max() < 10.0


def test_set_field_unit_conversion_and_dimension_check(canonical_model):
    """set_field converts into the field's NATIVE unit and refuses
    dimensionally-incompatible units (Kelvin for keV-native temperature
    once silently mis-scaled by 1.16e7)."""
    m = canonical_model
    n = m.num_elements
    # same-dimension conversion into a galactic-base field
    m2 = cg.ClusterModel(n, {k: np.array(v) for k, v in m.fields.items()})
    rho_cgs = np.asarray(m["density"]) * units.galactic_to_cgs_factor(
        "density")
    m2.set_field("density", rho_cgs, unit="g/cm**3")
    assert np.allclose(m2["density"], m["density"], rtol=1e-12)
    # native-unit family conversion (uG -> gauss)
    m2.set_field("magnetic_field_strength", np.full(n, 5.0), unit="uG")
    assert np.allclose(m2["magnetic_field_strength"], 5.0e-6)
    # wrong dimension refuses loudly
    with pytest.raises(ValueError, match="keV"):
        m2.set_field("temperature", np.full(n, 1.0e7), unit="K")
    with pytest.raises(ValueError, match="not convertible"):
        m2.set_field("density", np.full(n, 1.0), unit="kpc")


def test_magnetic_pressure_painting_honors_convention(canonical_model,
                                                      tmp_path):
    """YTHDF5.add_model paints p_B = B^2/(8 pi) for Gaussian-convention
    fields and B^2/2 for Lorentz-Heaviside ones (the model records which
    setter convention produced its field)."""
    import h5py

    from cluster_generator_tpu.data_structures import YTHDF5

    n = canonical_model.num_elements
    fields = {k: np.array(v) for k, v in canonical_model.fields.items()}
    m_g = cg.ClusterModel(n, dict(fields))
    m_lh = cg.ClusterModel(n, dict(fields))
    m_g.set_magnetic_field_from_beta(100.0, gaussian=True)
    m_lh.set_magnetic_field_from_beta(100.0, gaussian=False)
    # both conventions represent the SAME physical p_B = P/beta
    vals = []
    for tag, m in (("g", m_g), ("lh", m_lh)):
        fn = str(tmp_path / f"{tag}.h5")
        ds = YTHDF5.build(fn, (16, 16, 16),
                          np.array([[-2000.0, 2000.0]] * 3), chunksize=16)
        ds.add_model(m, [0, 0, 0], [0, 0, 0])
        with h5py.File(fn) as f:
            vals.append(f["grid"]["magnetic_pressure"][()])
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-12)
    assert (vals[0] > 0).all()


def test_hse_invariant_random_parameter_sweep():
    """HSE and virial residuals hold across a randomized (M200, c, z,
    f_gas) parameter sweep — the canonical-cluster invariants generalize
    over the builder's whole input space (vmapped, one compile)."""
    import jax

    from cluster_generator_tpu.core.interp import cubic_spline, spline_eval
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster

    rng = np.random.default_rng(11)
    M = 10 ** rng.uniform(14.0, 15.4, 8)
    c = rng.uniform(3.0, 9.0, 8)

    fields = jax.jit(jax.vmap(
        lambda m, cc: build_one_cluster(m, cc, num_points=1000,
                                        with_df=True)))(
        jnp.asarray(M), jnp.asarray(c))
    for i in range(M.size):
        rr = np.asarray(fields["radius"][i])
        P = np.asarray(fields["pressure"][i])
        rho = np.asarray(fields["density"][i])
        g = np.asarray(fields["gravitational_field"][i])
        dPdr = np.asarray(spline_eval(
            cubic_spline(jnp.asarray(rr), jnp.asarray(P)), jnp.asarray(rr),
            nu=1))
        hse = (dPdr - rho * g) / (rho * g)
        assert np.abs(hse).max() < 1e-4, (i, np.abs(hse).max())
        # DF physical: finite everywhere, non-negative
        df = np.asarray(fields["dm_df"][i])
        assert np.isfinite(df).all() and (df >= 0).all(), i
        # masses monotone, potential negative and increasing outward
        assert (np.diff(np.asarray(fields["total_mass"][i])) >= 0).all()
        phi = np.asarray(fields["gravitational_potential"][i])
        assert (phi < 0).all() and (np.diff(phi) > 0).all(), i
