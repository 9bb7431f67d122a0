"""Fused on-device merger pipeline vs the class-based API (pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import kstest

import cluster_generator_tpu as cg
from cluster_generator_tpu.pipeline import (
    binary_merger_ic,
    build_merger_models,
    build_speed_tables,
)


@pytest.fixture(scope="module")
def merger():
    parts, fields, tables = binary_merger_ic(
        [1.5e15, 1.0e15], [4.0, 5.0],
        [[-1500.0, 0, 0], [1500.0, 0, 0]],
        [[0.3, 0, 0], [-0.45, 0, 0]],
        {"gas": 100_000, "dm": 80_000, "star": 20_000},
        key=jax.random.key(3))
    return parts, fields, tables


def test_models_match_class_api(merger):
    _, fields, _ = merger
    m = cg.ClusterModel.from_dens_and_tden  # sanity: same canonical builder
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster

    single = build_one_cluster(1.5e15, 4.0, num_points=1000)
    assert np.allclose(np.asarray(fields["total_mass"][0]),
                       np.asarray(single["total_mass"]), rtol=1e-10)
    # stellar DF present and positive
    assert (np.asarray(fields["star_df"]) >= 0).all()


def test_counts_and_dtypes(merger):
    parts, _, _ = merger
    assert parts["gas", "particle_position"].shape[0] == 100_000
    assert parts["dm", "particle_position"].shape[0] == 80_000
    assert parts["star", "particle_position"].shape[0] == 20_000
    assert parts["gas", "particle_position"].dtype == jnp.float32
    for v in parts.values():
        assert np.isfinite(np.asarray(v)).all()


def test_bulk_velocities(merger):
    parts, fields, _ = merger
    # halo 1's dm share: counts pro-rated by mass
    vx = np.asarray(parts["dm", "particle_velocity"][:, 0])
    # overall mean between the two bulk velocities
    assert -0.45 < vx.mean() < 0.3
    # gas mixing keeps velocities inside the bulk-velocity hull
    gvx = np.asarray(parts["gas", "particle_velocity"][:, 0])
    assert gvx.min() >= -0.45 - 1e-5 and gvx.max() <= 0.3 + 1e-5


def test_radius_distribution_matches_class_sampler(merger):
    """KS: pipeline DM radii (halo 1) vs the ClusterModel path distribution."""
    parts, fields, _ = merger
    rr = np.asarray(fields["radius"][0])
    mm = np.asarray(fields["dark_matter_mass"][0])
    m_rmax = np.interp(5000.0, rr, mm)
    # halo-1 dm particles are the first block
    w = mm[np.searchsorted(rr, 5000.0) - 1]
    n1 = int(round(80_000 * (np.interp(5000.0, rr, mm)
                             / (np.interp(5000.0, rr, mm)
                                + np.interp(5000.0,
                                            np.asarray(fields["radius"][1]),
                                            np.asarray(fields["dark_matter_mass"][1]))))))
    pos1 = np.asarray(parts["dm", "particle_position"][:n1]) - [-1500.0, 0, 0]
    r = np.linalg.norm(pos1, axis=1)
    cdf = lambda x: np.interp(x, np.insert(rr, 0, 0),
                              np.insert(np.clip(mm / m_rmax, 0, 1), 0, 0))
    stat, pval = kstest(r, cdf)
    assert pval > 1e-4, (stat, pval)


def test_gas_mixing_matches_reference_formula(merger):
    """Spot-check mixed density/energy against manual two-halo sums."""
    parts, fields, _ = merger
    pos = np.asarray(parts["gas", "particle_position"])[:500]
    dens = np.asarray(parts["gas", "density"])[:500]
    eint = np.asarray(parts["gas", "thermal_energy"])[:500]
    centers = np.array([[-1500.0, 0, 0], [1500.0, 0, 0]])
    d_sum = np.zeros(500)
    e_sum = np.zeros(500)
    for i in range(2):
        rr = np.asarray(fields["radius"][i])
        dd = np.asarray(fields["density"][i])
        ee = 1.5 * np.asarray(fields["pressure"][i]) / dd
        r = np.linalg.norm(pos - centers[i], axis=1)
        di = np.interp(r, rr, dd)
        d_sum += di
        e_sum += np.interp(r, rr, ee) * di
    # the pipeline lerps with log-grid fractional weights (computed index);
    # np.interp lerps linear-in-r — both O(dr^2) interpolants, differing by
    # O(dr^2) ~ 1e-4 on the 1000-point log grid
    assert np.allclose(dens, d_sum, rtol=5e-4)
    assert np.allclose(eint, e_sum / d_sum, rtol=5e-4)


def test_speeds_below_escape(merger):
    parts, fields, _ = merger
    # halo-2 star block is last; use all stars against the max psi of both
    vel = np.asarray(parts["star", "particle_velocity"])
    speed = np.linalg.norm(vel - np.array([[0.3, 0, 0]]), axis=1)
    psi_max = float(np.max(-np.asarray(fields["gravitational_potential"])))
    vesc_max = np.sqrt(2 * psi_max)
    assert (speed < vesc_max + 0.45 + 1e-3).all()


@pytest.mark.slow
def test_three_halo_pipeline_with_tracers_and_potential():
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic,
    )

    M200 = jnp.asarray([1.5e15, 1.0e15, 8.0e14])
    conc = jnp.asarray([4.0, 5.0, 5.5])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0], [0.0, 2000.0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.3, 0, 0], [0.0, -0.3, 0]])
    rmax = jnp.asarray([4000.0, 4000.0, 4000.0])
    f = build_merger_models(M200, conc, num_points=512)
    tb = build_speed_tables(f)
    tb["radius"] = build_radius_tables(f, rmax)
    parts = sample_merger_ic(
        f, tb, centers, vels, rmax, jax.random.key(1),
        (30_000, 20_000, 10_000), (30_000, 20_000, 10_000),
        (6_000, 4_000, 2_000), n_tracer=(5_000, 3_000, 2_000),
        compute_potential=True)
    assert parts["gas", "particle_position"].shape == (60_000, 3)
    assert parts["tracer", "particle_position"].shape == (10_000, 3)
    assert (np.asarray(parts["tracer", "particle_mass"]) == 0).all()
    for sp in ("gas", "dm", "star"):
        phi = np.asarray(parts[sp, "particle_potential"])
        assert (phi < 0).all() and np.isfinite(phi).all()
    # three bulk velocities present among dm draws
    vx = np.asarray(parts["dm", "particle_velocity"][:, 0])
    assert abs(vx[:30000].mean() - 0.3) < 0.05
    assert abs(vx[30000:50000].mean() + 0.3) < 0.05


def test_attach_field_to_particles(merger):
    from cluster_generator_tpu.pipeline import attach_field_to_particles

    parts, _, _ = merger
    B = cg.RandomMagneticField([-4000.0] * 3, [4000.0] * 3, [32] * 3,
                               200.0, 1000.0, 1.0e-6, prng=5,
                               dtype=jnp.float32)
    out = attach_field_to_particles(dict(parts), B)
    v = np.asarray(out["gas", "magnetic_field"])
    assert v.shape == (parts["gas", "particle_position"].shape[0], 3)
    assert np.isfinite(v).all() and np.abs(v).max() > 0
    # spot check vs scipy on a handful of particles
    from scipy.interpolate import RegularGridInterpolator

    rgi = RegularGridInterpolator((B["x"], B["y"], B["z"]),
                                  B["magnetic_field_x"], bounds_error=False,
                                  fill_value=0.0)
    pos = np.asarray(parts["gas", "particle_position"][:64], np.float64)
    assert np.allclose(v[:64, 0], rgi(pos), rtol=2e-4, atol=1e-12)


@pytest.mark.slow
def test_sharded_merger_sampling():
    """Particle draws shard over the mesh; distributions match the
    single-device path statistically."""
    from jax.sharding import Mesh

    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic_sharded,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 8), ("ens", "part"))
    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([4000.0, 4000.0])
    f = build_merger_models(M200, conc, num_points=512)
    tb = build_speed_tables(f)
    tb["radius"] = build_radius_tables(f, rmax)
    parts = sample_merger_ic_sharded(
        mesh, f, tb, centers, vels, rmax, jax.random.key(9),
        (40_000, 24_000), (40_000, 24_000), (8_000, 8_000))
    assert parts["gas", "particle_position"].shape == (64_000, 3)
    assert len(parts["dm", "particle_position"].sharding.device_set) == 8
    # per-shard streams are independent: shard blocks differ
    pos = np.asarray(parts["dm", "particle_position"])
    assert not np.allclose(pos[:1000], pos[8000:9000])
    assert np.isfinite(pos).all()
    # distribution sanity: escape bound still holds per shard
    vel = np.asarray(parts["dm", "particle_velocity"])
    psi_max = float(np.max(-np.asarray(f["gravitational_potential"])))
    speed = np.linalg.norm(vel, axis=1)
    assert speed.max() < np.sqrt(2 * psi_max) + 0.45 + 1e-3


@pytest.mark.slow
def test_merger_ic_fused_matches_staged():
    """The single-program path equals the staged path for the same key."""
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        merger_ic_fused,
        sample_merger_ic,
    )

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([4000.0, 4000.0])
    ng, nd, ns = (20_000, 12_000), (16_000, 10_000), (4_000, 2_000)

    f = build_merger_models(M200, conc, num_points=512)
    tb = build_speed_tables(f)
    tb["radius"] = build_radius_tables(f, rmax)
    staged = sample_merger_ic(f, tb, centers, vels, rmax, jax.random.key(7),
                              ng, nd, ns)
    fused, ffields = merger_ic_fused(M200, conc, centers, vels, rmax,
                                     jax.random.key(7), ng, nd, ns,
                                     num_points=512,
                                     compute_potential=True)
    for key in staged:
        assert np.allclose(np.asarray(staged[key]), np.asarray(fused[key]),
                           rtol=1e-5, atol=1e-7), key
    assert (np.asarray(fused["dm", "particle_potential"]) < 0).all()
    assert np.allclose(np.asarray(ffields["total_mass"]),
                       np.asarray(f["total_mass"]), rtol=1e-12)


def test_pipeline_energy_distribution():
    """Joint (r, v) validation of the f32 fast path: single-halo pipeline
    draws follow N(E) ∝ f(E) g(E) (same check as the class API's
    tests/test_sampling.py::test_energy_distribution)."""
    from scipy.integrate import quad
    from scipy.interpolate import InterpolatedUnivariateSpline as IUS

    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic,
    )

    M200 = jnp.asarray([1.5e15])
    conc = jnp.asarray([4.0])
    centers = jnp.zeros((1, 3))
    vels = jnp.zeros((1, 3))
    rmax = jnp.asarray([5000.0])
    f = build_merger_models(M200, conc, num_points=1000)
    tb = build_speed_tables(f)
    tb["radius"] = build_radius_tables(f, rmax)
    parts = sample_merger_ic(f, tb, centers, vels, rmax, jax.random.key(21),
                             (1,), (200_000,), (1,))

    rr = np.asarray(f["radius"][0])
    psi_arr = -np.asarray(f["gravitational_potential"][0])
    psi_r = IUS(rr, psi_arr)
    pos = np.asarray(parts["dm", "particle_position"], np.float64)
    vel = np.asarray(parts["dm", "particle_velocity"], np.float64)
    r = np.linalg.norm(pos, axis=1)
    E = psi_r(r) - 0.5 * (vel**2).sum(axis=1)

    ee = psi_arr[::-1]
    ff = np.asarray(f["dm_df"][0])[::-1]
    f_sp = IUS(ee, ff)
    e_lo = float(psi_r(4000.0))
    e_hi = float(psi_r(50.0))
    sel = (E > e_lo) & (E < e_hi)
    assert sel.sum() > 50_000

    def g_of_E(e):
        r_max_e = min(float(IUS(ee, rr[::-1])(e)), 5000.0)
        val, _ = quad(lambda x: x * x * np.sqrt(
            max(2.0 * (psi_r(x) - e), 0.0)), rr[0], r_max_e, limit=200)
        return 16.0 * np.pi**2 * val

    grid = np.linspace(e_lo, e_hi, 200)
    pdf = np.array([max(float(f_sp(e)), 0.0) * g_of_E(e) for e in grid])
    cdf_vals = np.concatenate([[0.0], np.cumsum(
        0.5 * (pdf[1:] + pdf[:-1]) * np.diff(grid))])
    cdf_vals /= cdf_vals[-1]
    from scipy.stats import kstest

    stat, pval = kstest(E[sel], lambda x: np.interp(x, grid, cdf_vals))
    assert pval > 1e-4, (stat, pval, int(sel.sum()))


def test_sharded_gadget_export_roundtrip(tmp_path):
    """Per-host sharded export: the virtual 8-device mesh writes 8 Gadget
    shard files whose headers form one consistent snapshot, and
    from_gadget_files reassembles the exact particle set."""
    from jax.sharding import Mesh

    import h5py
    from cluster_generator_tpu.parallel.export import (
        write_sharded_gadget_files,
    )
    from cluster_generator_tpu.particles import ClusterParticles
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic_sharded,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("part",))
    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
    vels = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
    rmax = jnp.asarray([3000.0, 3000.0])
    f = build_merger_models(M200, conc, num_points=512)
    tb = build_speed_tables(f)
    tb["radius"] = build_radius_tables(f, rmax)
    parts = sample_merger_ic_sharded(
        mesh, f, tb, centers, vels, rmax, jax.random.key(3),
        (8_000, 8_000), (8_000, 8_000), (1_600, 1_600),
        compute_potential=True)

    box = 14_000.0
    base = tmp_path / "merger_ic"
    files = write_sharded_gadget_files(parts, box, base, overwrite=False,
                                       center_offset=[box / 2] * 3)
    assert len(files) == 8
    assert [fn.name for fn in files] == [f"merger_ic.{i}.h5"
                                         for i in range(8)]

    # headers: one consistent multi-file snapshot, globally unique IDs
    totals, this_files, id_ranges = [], [], []
    for fn in files:
        with h5py.File(fn, "r") as fo:
            hdr = fo["Header"].attrs
            assert hdr["NumFilesPerSnapshot"] == 8
            totals.append(np.asarray(hdr["NumPart_Total"]))
            this_files.append(np.asarray(hdr["NumPart_ThisFile"]))
            for pt in ("PartType0", "PartType1", "PartType4"):
                ids = fo[pt]["ParticleIDs"][:]
                id_ranges.append((ids.min(), ids.max()))
    assert all((t == totals[0]).all() for t in totals)
    np.testing.assert_array_equal(sum(this_files), totals[0])
    all_ids = np.concatenate([np.arange(lo, hi + 1)
                              for lo, hi in id_ranges])
    assert len(np.unique(all_ids)) == len(all_ids)  # no ID overlap

    # reassembly: shard 0's path is enough; totals match the device arrays
    re = ClusterParticles.from_gadget_files(files[0])
    # the box at 14000 kpc per side comfortably contains r_max=3000 draws,
    # so no particles were clipped
    assert re.num_particles["gas"] == 16_000
    assert re.num_particles["dm"] == 16_000
    assert re.num_particles["star"] == 3_200
    got = re["dm", "particle_position"] - box / 2
    want = np.asarray(parts["dm", "particle_position"], np.float64)
    np.testing.assert_allclose(got, want, atol=2e-3)  # f32 file precision
    # potentials round-trip through the Potential block
    assert ("dm", "potential_energy") in re.fields
    want_pot = np.asarray(parts["dm", "particle_potential"], np.float64)
    np.testing.assert_allclose(re["dm", "potential_energy"], want_pot,
                               rtol=1e-5)


def test_radius_tables_honor_r_max(merger):
    """Regression: the top quantile bin must not walk into the P=1 plateau
    beyond r_max (it once produced draws at 3x the truncation radius)."""
    parts, fields, tables = merger
    rmax = 5000.0
    for kind in ("gas", "dm", "star"):
        assert float(np.asarray(tables["radius"][kind]).max()) <= rmax
    centers = np.array([[-1500.0, 0, 0], [1500.0, 0, 0]])
    for sp in ("gas", "dm", "star"):
        pos = np.asarray(parts[sp, "particle_position"], np.float64)
        r0 = np.linalg.norm(pos - centers[0], axis=1)
        r1 = np.linalg.norm(pos - centers[1], axis=1)
        assert (np.minimum(r0, r1) <= rmax + 1e-3).all()


def test_sharded_export_with_clipping_and_replicated_axis(tmp_path):
    """Global export metadata survives the hard cases: a 2-axis mesh whose
    'ens' axis replicates every array (shards must dedupe to the 'part'
    axis only), and a box small enough to clip particles (NumPart_Total
    and the ID offsets must come from the post-clip collective counts,
    not file order)."""
    import h5py
    from jax.sharding import Mesh

    from cluster_generator_tpu.parallel.export import (
        write_sharded_gadget_files,
    )
    from cluster_generator_tpu.particles import ClusterParticles
    from cluster_generator_tpu.pipeline import (
        build_merger_models,
        build_radius_tables,
        build_speed_tables,
        sample_merger_ic_sharded,
    )

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("ens", "part"))
    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1200.0, 0, 0], [1200.0, 0, 0]])
    vels = jnp.zeros((2, 3))
    rmax = jnp.asarray([3000.0, 3000.0])
    f = build_merger_models(M200, conc, num_points=512)
    tb = build_speed_tables(f)
    tb["radius"] = build_radius_tables(f, rmax)
    parts = sample_merger_ic_sharded(
        mesh, f, tb, centers, vels, rmax, jax.random.key(5),
        (4_000, 4_000), (4_000, 4_000), (800, 800))

    box = 5_000.0  # r_max + offset exceeds the box -> guaranteed clipping
    files = write_sharded_gadget_files(parts, box, tmp_path / "clip",
                                       center_offset=[box / 2] * 3)
    assert len(files) == 4  # 'part' axis size, NOT the 8 devices

    totals, this_files, all_ids = [], [], []
    for fn in files:
        with h5py.File(fn, "r") as fo:
            hdr = fo["Header"].attrs
            assert hdr["NumFilesPerSnapshot"] == 4
            totals.append(np.asarray(hdr["NumPart_Total"]))
            this_files.append(np.asarray(hdr["NumPart_ThisFile"]))
            for pt in fo:
                if pt.startswith("PartType"):
                    all_ids.append(fo[pt]["ParticleIDs"][:])
    # clipping really happened, totals are consistent and global
    np.testing.assert_array_equal(sum(this_files), totals[0])
    assert totals[0].sum() < 17_600
    assert all((t == totals[0]).all() for t in totals)
    ids = np.concatenate(all_ids)
    assert len(np.unique(ids)) == len(ids)  # globally unique

    re = ClusterParticles.from_gadget_files(files[0])
    assert re.num_particles["dm"] == int(totals[0][1])
    assert re.num_particles["gas"] == int(totals[0][0])
