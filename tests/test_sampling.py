"""Statistical validation of particle sampling (KS tests against analytic
CDFs — the jax.random analogue of the reference's golden-particle tests,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import quad
from scipy.interpolate import InterpolatedUnivariateSpline as IUS
from scipy.stats import kstest

import cluster_generator_tpu as cg

N = 200_000


@pytest.fixture(scope="module")
def dm_particles(canonical_model):
    return canonical_model.generate_dm_particles(N, r_max=5000.0, prng=42)


def test_radius_distribution(canonical_model, dm_particles):
    """Sampled radii follow the enclosed-mass CDF (KS test)."""
    m = canonical_model
    r = np.linalg.norm(np.asarray(dm_particles["dm", "particle_position"]),
                       axis=1)
    rr = np.asarray(m["radius"])
    mm = np.asarray(m["dark_matter_mass"])
    ridx = np.searchsorted(rr, 5000.0)
    mtot = mm[ridx - 1]
    cdf = lambda x: np.interp(x, np.insert(rr, 0, 0.0),
                              np.insert(np.clip(mm / mtot, 0, 1), 0, 0.0))
    stat, pval = kstest(r, cdf)
    assert pval > 1e-3, (stat, pval)


def test_isotropy(dm_particles):
    """cos(theta) uniform on [-1,1]; phi uniform on [0, 2pi)."""
    pos = np.asarray(dm_particles["dm", "particle_position"])
    r = np.linalg.norm(pos, axis=1)
    cos_t = pos[:, 2] / r
    stat, pval = kstest(cos_t, lambda x: (x + 1) / 2)
    assert pval > 1e-3
    phi = np.arctan2(pos[:, 1], pos[:, 0])
    stat, pval = kstest(phi, lambda x: (x + np.pi) / (2 * np.pi))
    assert pval > 1e-3


def test_speed_distribution_at_radius(canonical_model, dm_particles):
    """Speeds of particles in a narrow radial shell follow
    v^2 f(psi - v^2/2) (KS test against the numerically integrated CDF)."""
    m = canonical_model
    v = m.dm_virial
    pos = np.asarray(dm_particles["dm", "particle_position"])
    vel = np.asarray(dm_particles["dm", "particle_velocity"])
    r = np.linalg.norm(pos, axis=1)
    speed = np.linalg.norm(vel, axis=1)

    r0 = 500.0
    sel = (r > r0 * 0.97) & (r < r0 * 1.03)
    assert sel.sum() > 2000
    speeds = speed[sel]

    rr = np.asarray(m["radius"])
    psi_r = IUS(rr, v.ee[::-1])
    # use the shell-center psi; the shell is narrow
    psi = float(psi_r(r0))
    f_sp = IUS(v.ee, v.ff)
    vesc = np.sqrt(2 * psi)
    pdf = lambda u: u**2 * max(f_sp(psi - u**2 / 2.0), 0.0)
    norm = quad(pdf, 0, vesc, limit=200)[0]
    grid = np.linspace(0, vesc, 2001)
    cdf_vals = np.concatenate([[0.0], np.cumsum(
        0.5 * (np.array([pdf(u) for u in grid[1:]])
               + np.array([pdf(u) for u in grid[:-1]]))
        * np.diff(grid))]) / norm
    cdf = lambda x: np.interp(x, grid, cdf_vals)
    stat, pval = kstest(speeds, cdf)
    # shell width introduces slight smearing; accept modest p
    assert pval > 1e-4, (stat, pval, speeds.size)


def test_speeds_below_escape(canonical_model, dm_particles):
    m = canonical_model
    v = m.dm_virial
    pos = np.asarray(dm_particles["dm", "particle_position"])
    vel = np.asarray(dm_particles["dm", "particle_velocity"])
    r = np.linalg.norm(pos, axis=1)
    speed = np.linalg.norm(vel, axis=1)
    rr = np.asarray(m["radius"])
    psi_r = IUS(rr, v.ee[::-1])
    vesc = np.sqrt(2 * np.maximum(psi_r(r), 0.0))
    assert (speed <= vesc * (1 + 1e-10)).all()


def test_equal_masses_and_total(canonical_model, dm_particles):
    m = canonical_model
    masses = np.asarray(dm_particles["dm", "particle_mass"])
    assert np.allclose(masses, masses[0])
    rr = np.asarray(m["radius"])
    mm = np.asarray(m["dark_matter_mass"])
    ridx = np.searchsorted(rr, 5000.0)
    assert masses.sum() == pytest.approx(mm[ridx - 1], rel=1e-10)


def test_gas_particles(canonical_model):
    p = canonical_model.generate_gas_particles(50_000, prng=7,
                                               compute_potential=True)
    assert (np.asarray(p["gas", "particle_velocity"]) == 0).all()
    e = np.asarray(p["gas", "thermal_energy"])
    assert (e > 0).all() and np.isfinite(e).all()
    # thermal energy should match 1.5 P / rho at the particle radius
    r = np.linalg.norm(np.asarray(p["gas", "particle_position"]), axis=1)
    rr = np.asarray(canonical_model["radius"])
    e_arr = 1.5 * np.asarray(canonical_model["pressure"]) \
        / np.asarray(canonical_model["density"])
    e_ref = IUS(rr, e_arr)(r)
    # energies are cubic-spline-exact at the 4096 quantile nodes and
    # linearly lerped between them (sampling._node_value_lerp): median
    # error is the node-lerp resolution, not machine precision
    assert np.median(np.abs(e - e_ref) / e_ref) < 1e-6
    assert (np.asarray(p["gas", "particle_potential"]) < 0).all()


def test_gas_particles_arbitrary_grid_clamps_below_grid_draws(
        canonical_model):
    """The non-log-uniform fallback shares ONE bracketing search across
    fields and CLAMPS queries to the knot range like the log-uniform
    path: the sampling CDF starts at r = 0, so inner-bin draws land
    below rr[0], where boundary-polynomial extrapolation turned
    1.5 P/rho negative (observed e = -21 at r = 0.56 rr[0])."""
    import cluster_generator_tpu as cg

    rr = np.asarray(canonical_model["radius"])
    warped = np.sort(rr * (1.0 + 0.01 * np.sin(np.arange(rr.size))))
    fields = dict(canonical_model.fields)
    fields["radius"] = warped
    m2 = cg.ClusterModel(len(warped), fields)

    p = m2.generate_gas_particles(50_000, prng=2, compute_potential=True)
    e = np.asarray(p["gas", "thermal_energy"])
    assert np.isfinite(e).all() and (e > 0).all()
    r = np.linalg.norm(np.asarray(p["gas", "particle_position"]), axis=1)
    e_arr = 1.5 * np.asarray(m2["pressure"]) / np.asarray(m2["density"])
    e_ref = IUS(warped, e_arr)(np.clip(r, warped[0], warped[-1]))
    assert np.max(np.abs(e - e_ref) / e_ref) < 1e-12  # cubic-exact
    assert (np.asarray(p["gas", "particle_potential"]) < 0).all()

    dm = cg.VirialEquilibrium(m2, "dark_matter").generate_particles(
        20_000, compute_potential=True, prng=3)
    phi = np.asarray(dm["dm", "particle_potential"])
    assert np.isfinite(phi).all() and (phi < 0).all()


def test_tracer_particles(canonical_model):
    p = canonical_model.generate_tracer_particles(10_000, prng=3)
    assert (np.asarray(p["tracer", "particle_mass"]) == 0).all()
    assert (np.asarray(p["tracer", "particle_velocity"]) == 0).all()
    assert p.num_particles["tracer"] == 10_000


def test_sub_sample(canonical_model):
    p = canonical_model.generate_gas_particles(10_000, sub_sample=4, prng=5)
    r = np.linalg.norm(np.asarray(p["gas", "particle_position"]), axis=1)
    # radii tile with period 2500 (positions differ by angles)
    assert np.allclose(r[:2500], r[2500:5000], rtol=1e-12)


def test_reproducibility(canonical_model):
    p1 = canonical_model.generate_dm_particles(1000, prng=123)
    p2 = canonical_model.generate_dm_particles(1000, prng=123)
    assert np.array_equal(p1["dm", "particle_position"],
                          p2["dm", "particle_position"])
    p3 = canonical_model.generate_dm_particles(1000, prng=124)
    assert not np.array_equal(p1["dm", "particle_position"],
                              p3["dm", "particle_position"])


def test_energy_distribution(canonical_model, dm_particles):
    """Joint (r, v) correctness: sampled relative energies E = psi(r) - v^2/2
    follow N(E) dE ∝ f(E) g(E) dE with the density of states
    g(E) = (4 pi)^2 int r^2 sqrt(2 (psi(r) - E)) dr — a stronger check than
    the radius/speed marginals."""
    from scipy.integrate import quad

    m = canonical_model
    v = m.dm_virial
    pos = np.asarray(dm_particles["dm", "particle_position"])
    vel = np.asarray(dm_particles["dm", "particle_velocity"])
    r = np.linalg.norm(pos, axis=1)
    rr = np.asarray(m["radius"])
    psi_r = IUS(rr, v.ee[::-1])
    E = psi_r(r) - 0.5 * (vel**2).sum(axis=1)

    # restrict to energies bound within the sampled region (r_max = 5000):
    # particles at r < 5000 can carry E down to psi(5000) before truncation
    # effects matter; use a safely interior window
    e_lo = float(psi_r(4000.0))
    e_hi = float(psi_r(50.0))
    sel = (E > e_lo) & (E < e_hi)
    assert sel.sum() > 50_000

    f_sp = IUS(v.ee, v.ff)

    def g_of_E(e):
        # integrate over radii where psi(r) > e, i.e. r < r_of_psi(e)
        r_max_e = float(IUS(v.ee, rr[::-1])(e))
        r_max_e = min(r_max_e, 5000.0)
        val, _ = quad(lambda x: x * x * np.sqrt(
            max(2.0 * (psi_r(x) - e), 0.0)), rr[0], r_max_e, limit=200)
        return 16.0 * np.pi**2 * val

    grid = np.linspace(e_lo, e_hi, 200)
    pdf = np.array([max(float(f_sp(e)), 0.0) * g_of_E(e) for e in grid])
    cdf_vals = np.concatenate([[0.0], np.cumsum(
        0.5 * (pdf[1:] + pdf[:-1]) * np.diff(grid))])
    # normalize over the window and condition the sample on it
    cdf_vals /= cdf_vals[-1]
    cdf = lambda x: np.interp(x, grid, cdf_vals)
    stat, pval = kstest(E[sel], cdf)
    assert pval > 1e-4, (stat, pval, sel.sum())


def test_sub_sample_non_divisible_counts(canonical_model):
    """num_particles not divisible by sub_sample must still produce
    exactly num_particles (the tile once fell one copy short and crashed
    broadcasting downstream)."""
    p = canonical_model.generate_gas_particles(10, r_max=2000.0,
                                               sub_sample=3, prng=1)
    assert p.num_particles["gas"] == 10
    assert p["gas", "particle_position"].shape == (10, 3)
    p2 = canonical_model.generate_dm_particles(1001, r_max=2000.0,
                                               sub_sample=4, prng=2,
                                               compute_potential=True)
    assert p2.num_particles["dm"] == 1001
    assert p2["dm", "particle_potential"].shape == (1001,)


def test_r_max_below_grid_raises(canonical_model):
    """r_max below the first grid point once wrapped the index and
    silently sampled the whole grid with the full-grid mass."""
    with pytest.raises(ValueError, match="below the first grid point"):
        canonical_model.generate_dm_particles(100, r_max=0.05, prng=3)


def test_generate_particle_radii_exact_api(canonical_model):
    """The public exact-interp API (reference utils.py:154-166 parity)
    still stands on its own after the generators moved to the
    quantile-table fast path: draws respect r_max, mtot matches the
    truncated mass, and the distribution agrees with the table path."""
    from scipy.stats import ks_2samp

    from cluster_generator_tpu.sampling import (
        _radius_quantile_pairs,
        _sample_radii_table,
        _truncated_cdf,
        generate_particle_radii,
    )

    r = np.asarray(canonical_model["radius"])
    m = np.asarray(canonical_model["dark_matter_mass"])
    radii, mtot = generate_particle_radii(r, m, 100_000, r_max=3000.0,
                                          prng=5)
    radii = np.asarray(radii)
    assert radii.max() <= 3000.0 * (1 + 1e-12)
    idx = np.searchsorted(r, 3000.0)
    assert mtot == pytest.approx(m[idx - 1])

    P, rr_ins, _ = _truncated_cdf(r, m, r_max=3000.0)
    tab_r, _, _ = _sample_radii_table(
        jax.random.key(5), _radius_quantile_pairs(P, rr_ins), 100_000)
    stat, p = ks_2samp(radii, np.asarray(tab_r))
    assert p > 1e-3, (stat, p)


def test_sample_speeds_legacy_matches_joint(canonical_model):
    """virial.sample_speeds (the bilinear psi-lookup path the class API
    used before round 3) and the joint-table path draw the same speed
    distribution at fixed radii — the legacy API remains correct."""
    from scipy.stats import ks_2samp

    from cluster_generator_tpu.core.interp import (
        adjacent_pairs,
        cubic_spline,
        spline_eval,
    )
    from cluster_generator_tpu.virial import (
        VirialEquilibrium,
        build_joint_speed_pairs,
        sample_speeds,
        sample_speeds_joint,
    )

    v = VirialEquilibrium(canonical_model)
    row_ee, s_inv = v._speed_table()
    rgrid = jnp.asarray(canonical_model["radius"])
    psi_grid = jnp.asarray(v.ee)[::-1]

    n = 100_000
    key = jax.random.key(8)
    kr, kv1, kv2 = jax.random.split(key, 3)
    u = jax.random.uniform(kr, (n,), dtype=jnp.float64)
    RQ = 2048
    q = jnp.linspace(0.0, 1.0, RQ)
    mm = jnp.asarray(canonical_model["dark_matter_mass"])
    r_q = jnp.interp(q * mm[-1], mm, rgrid)
    x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-9)
    kq = jnp.minimum(x.astype(jnp.int32), RQ - 2)
    wq = x - kq
    rp = adjacent_pairs(r_q)[kq]
    radius = (1.0 - wq) * rp[:, 0] + wq * rp[:, 1]

    psi_p = spline_eval(cubic_spline(rgrid, psi_grid), radius)
    legacy = np.asarray(sample_speeds(radius, psi_p, row_ee, s_inv, kv1))

    joint = build_joint_speed_pairs(rgrid, psi_grid, row_ee, s_inv, r_q,
                                    dtype=s_inv.dtype)
    new = np.asarray(sample_speeds_joint(joint, s_inv.shape[1], kq, wq,
                                         kv2))
    assert np.isfinite(legacy).all() and np.isfinite(new).all()
    stat, p = ks_2samp(legacy, new)
    assert p > 1e-3, (stat, p)


def test_parse_prng_accepts_all_reference_forms(canonical_model):
    """prng= accepts int, jax key, numpy RandomState (harvested for a
    seed), and None (entropy) — the reference-API compatibility matrix
    (sampling.parse_prng)."""
    m = canonical_model
    p_int = m.generate_tracer_particles(500, prng=42)
    p_key = m.generate_tracer_particles(500, prng=jax.random.key(42))
    # int seed and the equivalent key draw identically
    np.testing.assert_array_equal(
        p_int["tracer", "particle_position"],
        p_key["tracer", "particle_position"])
    # RandomState: accepted, deterministic given the same state
    p_rs1 = m.generate_tracer_particles(
        500, prng=np.random.RandomState(7))
    p_rs2 = m.generate_tracer_particles(
        500, prng=np.random.RandomState(7))
    np.testing.assert_array_equal(
        p_rs1["tracer", "particle_position"],
        p_rs2["tracer", "particle_position"])
    # None: entropy-seeded, still valid draws
    p_none = m.generate_tracer_particles(500, prng=None)
    r = np.linalg.norm(
        np.asarray(p_none["tracer", "particle_position"]), axis=1)
    assert np.isfinite(r).all() and (r > 0).all()


@pytest.mark.parametrize("M200,conc,seed", [
    (1.5e15, 4.0, 3), (3.0e14, 7.2, 11), (8.0e14, 5.5, 23),
])
def test_drawn_sigma_v_matches_jeans(M200, conc, seed):
    """The f32 speed-table node grid, validated against an OBSERVABLE
    (VERDICT r3 item 6): the radial velocity-dispersion profile of a
    drawn DM ensemble must match the isotropic Jeans sigma_r(r)
    (ClusterModel.compute_velocity_dispersion) across a randomized
    (M200, c) sweep — the drawn-particle analogue of the reference's
    check_virial (virial.py:78-106)."""
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster

    fields = jax.jit(lambda m, c: build_one_cluster(
        m, c, num_points=512, with_df=False))(M200, conc)
    m = cg.ClusterModel.from_arrays(
        {k: np.asarray(v) for k, v in fields.items()})
    sigma_jeans = np.asarray(m.compute_velocity_dispersion("dark_matter"))
    rr = np.asarray(m["radius"])

    p = m.generate_dm_particles(400_000, prng=seed)
    pos = np.asarray(p["dm", "particle_position"], dtype=np.float64)
    vel = np.asarray(p["dm", "particle_velocity"], dtype=np.float64)
    r = np.linalg.norm(pos, axis=1)
    v2 = np.sum(vel * vel, axis=1)

    # isotropy: sigma_r^2 = <v^2>/3 per radial bin; interior bins only
    # (the outermost bins mix truncation + sparse statistics)
    bins = np.geomspace(5.0, 3000.0, 16)
    idx = np.digitize(r, bins)
    devs = []
    for b in range(1, len(bins)):
        sel = idx == b
        if sel.sum() < 2000:
            continue
        sig_meas = np.sqrt(v2[sel].mean() / 3.0)
        r_cen = np.sqrt(bins[b - 1] * bins[b])
        sig_ref = np.interp(r_cen, rr, sigma_jeans)
        devs.append(abs(sig_meas / sig_ref - 1.0))
    devs = np.asarray(devs)
    assert devs.size >= 8  # the sweep actually covers the profile
    # statistical error at >=2000/bin is ~1.6%/sqrt(2); the band pins the
    # table-resolution systematic well below the physics tolerances
    assert np.median(devs) < 0.02, devs
    assert devs.max() < 0.06, devs


def test_df_node_grid_config_knobs():
    """df_node_grid_{body,top} are live config knobs: they reach
    speed_table_defaults() and change the table program (VERDICT r3
    item 6)."""
    from cluster_generator_tpu.core.config import cgparams
    from cluster_generator_tpu.virial import (
        speed_inverse_cdf_table,
        speed_table_defaults,
    )

    kw = speed_table_defaults()
    assert kw["nf1"] == cgparams["numerical"]["df_node_grid_body"]
    assert kw["nf2"] == cgparams["numerical"]["df_node_grid_top"]

    old = cgparams["numerical"]["df_node_grid_body"]
    try:
        cgparams["numerical"]["df_node_grid_body"] = 512
        assert speed_table_defaults()["nf1"] == 512
        # a coarse node grid still builds a monotone, in-range table
        ee = jnp.linspace(1e-4, 1.0, 64)
        ff = jnp.exp(ee) - 1.0
        tab = speed_inverse_cdf_table(ee, ff, n_s=128, n_q=64,
                                      table_dtype=jnp.float32,
                                      **{k: speed_table_defaults()[k]
                                         for k in ("nf1", "nf2")})
        t = np.asarray(tab)
        assert (t >= 0).all() and (t <= 1.0 + 1e-6).all()
        assert (np.diff(t, axis=1) >= -1e-6).all()
    finally:
        cgparams["numerical"]["df_node_grid_body"] = old
