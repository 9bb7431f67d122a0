"""TRUE cross-package golden parity: this framework vs the UPSTREAM
`cluster_generator` package itself.

The goldens in tests/answers/reference_model.h5 / reference_particles.h5
were produced by RUNNING the reference (at /root/reference) through
tests/refshim (scripts/generate_reference_answers.py) — its own
from_dens_and_tden, Eddington inversion, write_model_to_h5 and particle
generator — not by a scipy re-derivation.  This addresses the reference's
own answer-testing backbone (tests/utils/checkers.py:96-117) at the
BASELINE.md tolerance.

Caveats (documented, not hidden): the shim's physical constants share
this repo's SI anchors (CODATA 2018 + Msun = 1.98892e30 kg), so
constant-choice differences cancel; particle SPEEDS come from the shim's
numpy rejection sampler implementing the absent Cython module's contract
(virial.py:198-206), so particle parity is distributional (KS), never
bitwise (SURVEY.md §7 hard part (e)).
"""

import os

import h5py
import numpy as np
import pytest

ANSWER_DIR = os.path.join(os.path.dirname(__file__), "answers")
MODEL_FILE = os.path.join(ANSWER_DIR, "reference_model.h5")
PART_FILE = os.path.join(ANSWER_DIR, "reference_particles.h5")

needs_answers = pytest.mark.skipif(
    not (os.path.exists(MODEL_FILE) and os.path.exists(PART_FILE)),
    reason="reference answers not generated "
           "(scripts/generate_reference_answers.py)")

# fields stored by the reference in galactic units (+ its _keep_units);
# value conventions match this framework's field dict exactly
_FIELDS = [
    "radius", "density", "total_density", "stellar_density",
    "dark_matter_density", "temperature", "pressure", "total_mass",
    "gas_mass", "dark_matter_mass", "stellar_mass", "gas_fraction",
    "gravitational_potential", "gravitational_field",
    "electron_number_density", "entropy", "magnetic_field_strength",
]


@needs_answers
def test_model_fields_match_reference(canonical_model):
    """Every equilibrium field matches the reference package at 1e-6
    relative (BASELINE.md target; measured parity is ~2e-8)."""
    with h5py.File(MODEL_FILE, "r") as f:
        for name in _FIELDS:
            ref = f["fields"][name][()]
            mine = np.asarray(canonical_model[name])
            assert mine.shape == ref.shape, name
            rel = np.abs(mine - ref) / np.maximum(np.abs(ref), 1e-300)
            assert rel.max() < 1e-6, (name, rel.max())


@needs_answers
def test_df_matches_reference_package(canonical_model):
    """f(E) parity vs the reference's own Eddington inversion.

    The binding error is the REFERENCE's: its _generate_df runs quad at
    epsabs=epsrel=1.49e-5 (virial.py:60-61), an order looser than scipy's
    default, so ~4e-6 median deviation is the reference's own quadrature
    noise — this framework's g(E) is exact (closed-form Abel), and vs a
    1e-12-tolerance scipy run it sits at 1.8e-7 median (floor proof in
    test_virial.py::test_df_matches_scipy_reference).  The 1e-6 BASELINE
    target is therefore asserted against scipy-at-default in
    test_virial.py; here we assert the reference package itself
    reproduces within ITS OWN advertised tolerance."""
    with h5py.File(MODEL_FILE, "r") as f:
        for key, virial in [("dm_df", canonical_model.dm_virial),
                            ("star_df", canonical_model.star_virial)]:
            ref = f[key][()]
            mine = np.asarray(virial.df)
            rel = np.abs(mine - ref) / np.abs(ref)
            assert np.median(rel) < 1.49e-5, (key, np.median(rel))
            assert rel.max() < 1e-3, (key, rel.max())


@needs_answers
def test_reference_virial_check_agrees(canonical_model):
    """The reference's stored DF passes THIS framework's check_virial
    reconstruction — cross-package consistency of the inverse problem."""
    import jax.numpy as jnp

    from cluster_generator_tpu.virial import check_virial_density

    with h5py.File(MODEL_FILE, "r") as f:
        ref_df = f["dm_df"][()]
    ee = canonical_model.dm_virial.ee
    rho = np.asarray(check_virial_density(jnp.asarray(ee),
                                          jnp.asarray(ref_df[::-1])))
    pden = np.asarray(canonical_model["dark_matter_density"])
    chk = (rho[::-1] - pden) / pden
    assert chk.max() < 1e-4, chk.max()


@pytest.fixture(scope="module")
def reference_particles():
    with h5py.File(PART_FILE, "r") as f:
        grp = f["dm"]
        return {k: grp[k][()] for k in grp}


@pytest.fixture(scope="module")
def framework_particles(canonical_model):
    """The framework-side 200k draw, shared by the particle parity tests
    (regenerating it per test tripled the wall-clock for nothing)."""
    return canonical_model.generate_dm_particles(200_000, r_max=5000.0,
                                                 prng=42)


@needs_answers
def test_particle_radius_distribution_matches_reference(
        framework_particles, reference_particles):
    """Two-sample KS on radii: reference draws (numpy MT19937 inverse-CDF)
    vs this framework's (jax.random + quantile tables), same model, same
    r_max.  Statistic threshold, not p-value: at n=2e5 the test resolves
    D ~ 6e-3; the table discretization sits well below it."""
    mine = framework_particles
    r_mine = np.linalg.norm(
        np.asarray(mine["dm", "particle_position"]), axis=1)
    r_ref = np.linalg.norm(
        reference_particles["particle_position"], axis=1)
    from scipy.stats import ks_2samp

    d, _ = ks_2samp(r_mine, r_ref)
    assert d < 0.01, d


@needs_answers
def test_particle_speed_distribution_matches_reference(
        framework_particles, reference_particles):
    """Two-sample KS on speeds in a radial shell (the joint test lives in
    test_sampling.py); also total-speed distribution and second moment."""
    from scipy.stats import ks_2samp

    mine = framework_particles
    v_mine = np.linalg.norm(
        np.asarray(mine["dm", "particle_velocity"]), axis=1)
    v_ref = np.linalg.norm(
        reference_particles["particle_velocity"], axis=1)
    d, _ = ks_2samp(v_mine, v_ref)
    assert d < 0.01, d
    # kinetic-energy proxy: second moments within 1%
    assert abs(np.mean(v_mine**2) / np.mean(v_ref**2) - 1.0) < 0.01


@needs_answers
def test_particle_masses_match_reference(framework_particles,
                                         reference_particles):
    mine = framework_particles
    m_mine = np.asarray(mine["dm", "particle_mass"])
    m_ref = reference_particles["particle_mass"]
    assert np.allclose(m_mine[0], m_ref[0], rtol=1e-6)
    assert np.allclose(m_mine.sum(), m_ref.sum(), rtol=1e-6)


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_second_configuration_cross_package_parity():
    """Cross-package parity at a SECOND cluster configuration (different
    mass, concentration, redshift, f_gas, grid) — the committed goldens
    cover only the canonical cluster; this runs the reference LIVE via
    refshim and compares the full field set + DF in-session (the
    reference's adaptive quads emit ~3e5 IntegrationWarnings here —
    its own behavior, silenced for log hygiene)."""
    import jax.numpy as jnp

    from tests.refshim import load_reference

    import cluster_generator_tpu as cg

    ref = load_reference()

    z, M200, conc, f_g = 0.35, 6.0e14, 6.5, 0.10
    rmin, rmax, npts = 0.2, 6.0e3, 600

    r200 = float(cg.find_overdensity_radius(M200, 200.0, z=z))
    a = r200 / conc
    M = float(cg.snfw_total_mass(M200, r200, a))
    rhot = cg.snfw_density_profile(M, a)
    Mt = cg.snfw_mass_profile(M, a)
    r500, M500 = cg.find_radius_mass(Mt, z=z, delta=500.0)
    rhog = cg.rescale_profile_by_mass(
        cg.vikhlinin_density_profile(1.0, 80.0, r200, 1.1, 0.7, 3),
        f_g * float(M500), float(r500))

    mine = cg.ClusterModel.from_dens_and_tden(
        rmin, rmax, rhog, rhot, stellar_density=0.02 * rhot,
        num_points=npts)

    # the reference package needs its own profile objects: wrap OURS as
    # plain callables (its RadialProfile accepts functions)
    rp = ref.radial_profiles
    ref_rhog = rp.RadialProfile(lambda r: np.asarray(
        rhog(jnp.asarray(np.atleast_1d(r)))))
    ref_rhot = rp.RadialProfile(lambda r: np.asarray(
        rhot(jnp.asarray(np.atleast_1d(r)))))
    ref_rhos = rp.RadialProfile(lambda r: 0.02 * np.asarray(
        rhot(jnp.asarray(np.atleast_1d(r)))))
    theirs = ref.ClusterModel.from_dens_and_tden(
        rmin, rmax, ref_rhog, ref_rhot, stellar_density=ref_rhos,
        num_points=npts)

    for name in ("density", "total_density", "pressure", "total_mass",
                 "temperature", "gravitational_potential",
                 "dark_matter_mass"):
        a_ = np.asarray(mine[name])
        b_ = np.asarray(theirs[name])
        rel = np.abs(a_ - b_) / np.maximum(np.abs(b_), 1e-300)
        assert np.median(rel) < 1e-5, (name, np.median(rel))
        assert rel.max() < 1e-3, (name, rel.max())

    # DF parity at the reference's own quad tolerance (the reference's
    # .dm_virial lazy property runs its per-energy adaptive quads; .df is
    # a unyt_array on the reversed radial grid — virial.py:68-76)
    v_mine = mine.dm_virial
    f_ref = np.asarray(theirs.dm_virial.df.d[::-1])
    f_me = np.asarray(v_mine.ff)
    sel = f_ref > f_ref.max() * 1e-8
    rel = np.abs(f_me[sel] - f_ref[sel]) / f_ref[sel]
    assert np.median(rel) < 1e-4, np.median(rel)
