"""ClusterParticles container + combination invariants
(reference tests/test_particles.py model)."""

import numpy as np
import pytest

import cluster_generator_tpu as cg
from cluster_generator_tpu.particles import (
    combine_two_clusters,
    resample_one_cluster,
)


@pytest.fixture(scope="module")
def parts(canonical_model):
    pd = canonical_model.generate_dm_particles(20_000, r_max=5000.0, prng=1)
    pg = canonical_model.generate_gas_particles(10_000, r_max=5000.0, prng=2)
    return pd + pg


def test_concatenation(canonical_model):
    p1 = canonical_model.generate_dm_particles(1000, prng=1)
    p2 = canonical_model.generate_dm_particles(500, prng=2)
    p = p1 + p2
    assert p.num_particles["dm"] == 1500


def test_drop_ptypes(parts):
    import copy

    p = copy.deepcopy(parts)
    p.drop_ptypes(["gas"])
    assert "gas" not in p.particle_types
    assert all(k[0] != "gas" for k in p.fields)


def test_make_radial_cut(parts):
    import copy

    p = copy.deepcopy(parts)
    p.make_radial_cut(1000.0)
    for ptype in p.particle_types:
        r = np.linalg.norm(p[ptype, "particle_position"], axis=1)
        assert (r <= 1000.0).all()
        assert p.num_particles[ptype] == r.size


def test_add_black_hole(parts):
    import copy

    p = copy.deepcopy(parts)
    p.add_black_hole(1.0e9)
    assert p.num_particles["black_hole"] == 1
    p.add_black_hole(2.0e9, pos=[10.0, 0.0, 0.0], vel=[0.0, 1.0, 0.0])
    assert p.num_particles["black_hole"] == 2
    assert p["black_hole", "particle_mass"][1] == 2.0e9


def test_add_black_hole_pot_min(canonical_model):
    p = canonical_model.generate_dm_particles(5000, prng=9,
                                              compute_potential=True)
    p.fields["dm", "potential_energy"] = p["dm", "particle_potential"]
    p._update_field_names()
    p.add_black_hole(1e9, use_pot_min=True)
    idx = np.argmin(p["dm", "potential_energy"])
    assert np.allclose(p["black_hole", "particle_position"][0],
                       p["dm", "particle_position"][idx])


def test_set_field_and_offsets(parts):
    import copy

    p = copy.deepcopy(parts)
    n = p.num_particles["gas"]
    p.set_field("gas", "metallicity", np.full(n, 0.3))
    assert (p["gas", "metallicity"] == 0.3).all()
    p.set_field("gas", "metallicity", np.full(n, 0.1), add=True)
    assert np.allclose(p["gas", "metallicity"], 0.4)
    with pytest.raises(ValueError):
        p.set_field("gas", "bad", np.ones(7))
    with pytest.raises(RuntimeError):
        p.set_field("gas", "nonexistent", np.ones(n), add=True)

    pos0 = p["gas", "particle_position"].copy()
    p.add_offsets([100.0, 0.0, 0.0], [0.0, 1.0, 0.0], ptypes=["gas"])
    assert np.allclose(p["gas", "particle_position"][:, 0], pos0[:, 0] + 100)
    assert np.allclose(p["gas", "particle_velocity"][:, 1], 1.0)


def test_native_h5_roundtrip(parts, tmp_path):
    fn = str(tmp_path / "parts.h5")
    parts.write_particles(fn)
    back = cg.ClusterParticles.from_file(fn)
    assert set(back.particle_types) == set(parts.particle_types)
    for key in parts.fields:
        assert np.allclose(back[key], parts[key], rtol=1e-12), key
    with pytest.raises(IOError):
        parts.write_particles(fn)


def test_gadget_roundtrip(parts, tmp_path):
    import copy

    fn = str(tmp_path / "gadget.h5")
    p = copy.deepcopy(parts)
    p.add_offsets([7000.0] * 3, [0.0] * 3)
    p.write_to_gadget_file(fn, 14000.0, dtype="float64", overwrite=True)
    back = cg.ClusterParticles.from_gadget_file(fn)
    assert set(back.particle_types) == {"gas", "dm"}
    # order is preserved within a type; units roundtrip through km/s etc.
    assert np.allclose(back["dm", "particle_position"],
                       p["dm", "particle_position"], rtol=1e-12)
    assert np.allclose(back["dm", "particle_velocity"],
                       p["dm", "particle_velocity"], rtol=1e-10, atol=1e-13)
    assert np.allclose(back["gas", "thermal_energy"],
                       p["gas", "thermal_energy"], rtol=1e-10)
    import h5py

    with h5py.File(fn) as f:
        hdr = f["Header"].attrs
        assert hdr["NumPart_ThisFile"][0] == p.num_particles["gas"]
        assert hdr["NumPart_ThisFile"][1] == p.num_particles["dm"]
        assert hdr["BoxSize"] == 14000.0


def test_combine_two_clusters(canonical_model):
    p1 = canonical_model.generate_dm_particles(5000, r_max=3000.0, prng=11) \
        + canonical_model.generate_gas_particles(5000, r_max=3000.0, prng=12)
    p2 = canonical_model.generate_dm_particles(5000, r_max=3000.0, prng=13) \
        + canonical_model.generate_gas_particles(5000, r_max=3000.0, prng=14)
    c1, c2 = [2000.0, 3000.0, 3000.0], [4000.0, 3000.0, 3000.0]
    v1, v2 = [0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]
    parts = combine_two_clusters(p1, p2, canonical_model, canonical_model,
                                 c1, c2, v1, v2)
    assert parts.num_particles["gas"] == 10000
    assert parts.num_particles["dm"] == 10000
    # dm bulk velocities offset by +-0.5 in x
    vx = parts["dm", "particle_velocity"][:, 0]
    assert abs(vx[:5000].mean() - 0.5) < 0.05
    assert abs(vx[5000:].mean() + 0.5) < 0.05
    # gas velocity is density-weighted momentum: between the two bulk v's
    gvx = parts["gas", "particle_velocity"][:, 0]
    assert (np.abs(gvx) <= 0.5 + 1e-12).all()
    # gas densities sum contributions: all positive finite
    assert (parts["gas", "density"] > 0).all()
    assert np.isfinite(parts["gas", "thermal_energy"]).all()


def test_resample_one_cluster(canonical_model):
    p = canonical_model.generate_gas_particles(5000, r_max=3000.0, prng=21)
    vol_before = p["gas", "particle_mass"] / p["gas", "density"]
    new = resample_one_cluster(p, canonical_model, [0.0] * 3, [0.1, 0.0, 0.0])
    assert np.allclose(new["gas", "particle_velocity"][:, 0], 0.1)
    vol_after = new["gas", "particle_mass"] / new["gas", "density"]
    assert np.allclose(vol_before, vol_after, rtol=1e-10)


def test_combine_three_clusters(canonical_model):
    from cluster_generator_tpu.particles import combine_three_clusters

    ps = []
    for seed in [31, 32, 33]:
        ps.append(canonical_model.generate_dm_particles(
            2000, r_max=2000.0, prng=seed)
            + canonical_model.generate_gas_particles(
                2000, r_max=2000.0, prng=seed + 100))
    centers = [[0.0, 0, 0], [3000.0, 0, 0], [1500.0, 2500.0, 0]]
    vels = [[0.3, 0, 0], [-0.3, 0, 0], [0.0, -0.3, 0]]
    parts = combine_three_clusters(
        ps[0], ps[1], ps[2], canonical_model, canonical_model,
        canonical_model, *centers, *vels)
    assert parts.num_particles["gas"] == 6000
    assert parts.num_particles["dm"] == 6000
    assert np.isfinite(parts["gas", "thermal_energy"]).all()
    assert (parts["gas", "density"] > 0).all()


def test_resample_with_passive_scalars(canonical_model):
    from cluster_generator_tpu.particles import resample_two_clusters

    p1 = canonical_model.generate_gas_particles(3000, r_max=2000.0, prng=41)
    p2 = canonical_model.generate_gas_particles(3000, r_max=2000.0, prng=42)
    p1.add_offsets([0.0] * 3, [0.0] * 3)
    p2.add_offsets([2500.0, 0.0, 0.0], [0.0] * 3)
    parts = p1 + p2
    # passive scalar: metal fraction profile on the model
    canonical_model.set_field("metallicity",
                              np.linspace(1.0, 0.1,
                                          canonical_model.num_elements))
    parts.set_field("gas", "metallicity", np.zeros(6000),
                    passive_scalar=True)
    out = resample_two_clusters(
        parts, canonical_model, canonical_model, [0.0] * 3,
        [2500.0, 0.0, 0.0], [0.1, 0, 0], [-0.1, 0, 0],
        radii=[2000.0, 2000.0], passive_scalars=["metallicity"])
    z = out["gas", "metallicity"]
    assert (z > 0).any()
    assert np.isfinite(z).all()
    assert z.max() <= 1.0 + 1e-6
    del canonical_model.fields["metallicity"]


def test_combine_clusters_with_heterogeneous_grids(canonical_model):
    """Regression: gas mixing must accept halo models built on DIFFERENT
    radial grid sizes (a stacked-over-halos rewrite once required equal
    shapes; the reference's per-halo spline loop never did)."""
    import cluster_generator_tpu as cg

    rhot = cg.snfw_density_profile(5e14, 400.0)
    rhog = cg.vikhlinin_density_profile(1.0, 80.0, 1200.0, 1.0, 0.67, 3)
    small = cg.ClusterModel.from_dens_and_tden(0.1, 1e4, rhog, rhot,
                                               num_points=500)
    assert small.num_elements != canonical_model.num_elements

    p1 = canonical_model.generate_gas_particles(3000, r_max=2500.0, prng=31)
    p2 = small.generate_gas_particles(3000, r_max=2500.0, prng=32)
    parts = combine_two_clusters(
        p1, p2, canonical_model, small,
        [2000.0, 3000.0, 3000.0], [4000.0, 3000.0, 3000.0],
        [0.3, 0.0, 0.0], [-0.3, 0.0, 0.0])
    assert parts.num_particles["gas"] == 6000
    assert (parts["gas", "density"] > 0).all()
    assert np.isfinite(parts["gas", "thermal_energy"]).all()
    assert (np.abs(parts["gas", "particle_velocity"][:, 0]) <= 0.3
            + 1e-12).all()


def test_sample_clusters_requires_a_density_field(canonical_model):
    """A clear error (not an opaque stack failure) when no halo model has
    gas fields."""
    from cluster_generator_tpu.particles import _sample_clusters

    p = canonical_model.generate_gas_particles(1000, r_max=2000.0, prng=33)
    nogas = {"radius": np.asarray(canonical_model["radius"])}
    with pytest.raises(ValueError, match="density"):
        _sample_clusters(p, [nogas], [[0.0] * 3], [[0.0] * 3])


def test_add_black_hole_pot_min_accepts_generator_field(canonical_model):
    """use_pot_min works directly on the 'particle_potential' field the
    generators actually store (the reference's add_black_hole only ever
    looked for 'potential_energy' — a key its generators never write,
    reference particles.py:197 vs virial.py:234)."""
    p = canonical_model.generate_dm_particles(5000, prng=9,
                                              compute_potential=True)
    p.add_black_hole(1e9, use_pot_min=True)
    idx = np.argmin(p["dm", "particle_potential"])
    assert np.allclose(p["black_hole", "particle_position"][0],
                       p["dm", "particle_position"][idx])


def test_gadget_writer_emits_potential_from_generator_field(canonical_model,
                                                            tmp_path):
    """write_to_gadget_file emits the Potential block for particles that
    carry 'particle_potential' (the advertised Potential mapping only
    matched 'potential_energy' and was silently dropped)."""
    import h5py

    p = canonical_model.generate_dm_particles(3000, prng=5,
                                              compute_potential=True)
    p.add_offsets([25000.0] * 3, [0.0] * 3)
    fn = str(tmp_path / "snap.h5")
    p.write_to_gadget_file(fn, 50000.0)
    with h5py.File(fn, "r") as f:
        pot = f["PartType1"]["Potential"][()]
    assert pot.shape[0] == 3000
    assert np.isfinite(pot).all() and (pot < 0).all()


def test_add_drops_one_sided_fields_and_keeps_passive_scalars(
        canonical_model):
    """__add__ keeps only fields both operands carry for shared particle
    types (a one-sided field has no values for the other's particles —
    it used to survive SHORTER than the particle count and break every
    masked cut downstream) and carries passive-scalar registrations
    (they were silently reset to [])."""
    p1 = canonical_model.generate_gas_particles(2000, prng=1)
    p2 = canonical_model.generate_gas_particles(1500, prng=2,
                                                compute_potential=True)
    p1.set_field("gas", "metal", np.full(2000, 0.3), passive_scalar=True)
    p2.set_field("gas", "metal", np.full(1500, 0.1), passive_scalar=True)
    tot = p1 + p2
    assert tot.num_particles["gas"] == 3500
    assert ("gas", "particle_potential") not in tot.fields
    for (pt, _), arr in tot.fields.items():
        assert arr.shape[0] == tot.num_particles[pt]
    assert tot.passive_scalars == ["metal"]
    np.testing.assert_array_equal(tot["gas", "metal"][:2000], 0.3)

    # disjoint particle types keep their one-sided fields whole
    dm = canonical_model.generate_dm_particles(1000, prng=3,
                                               compute_potential=True)
    both = p1 + dm
    assert ("dm", "particle_potential") in both.fields
    assert both.num_particles == {"gas": 2000, "dm": 1000}


def test_particle_index_keeps_integer_dtype(canonical_model, tmp_path):
    """particle_index carries Gadget IDs: the container preserves its
    integer dtype (a blanket f64 cast floated the IDs) and the native
    HDF5 round trip keeps it integral."""
    from cluster_generator_tpu.particles import ClusterParticles

    p = canonical_model.generate_dm_particles(1000, prng=4)
    p["dm", "particle_index"] = np.arange(1000, dtype=np.uint32)
    assert p["dm", "particle_index"].dtype == np.uint32
    fn = str(tmp_path / "idx.h5")
    p.write_particles(fn)
    q = ClusterParticles.from_file(fn)
    assert q["dm", "particle_index"].dtype.kind in "iu"
    np.testing.assert_array_equal(q["dm", "particle_index"],
                                  np.arange(1000))


def test_gas_mixing_clamps_to_model_grids(canonical_model):
    """Combined-cluster gas energies stay positive: the mixing splines
    clamp particle radii to each model's grid (below-grid draws exist —
    the sampling CDF starts at r=0 — and most particles sit far beyond
    the OTHER halo's r_max, where boundary-polynomial extrapolation can
    go negative; same wart fixed in sampling.py and _paint_chunk)."""
    from cluster_generator_tpu.particles import combine_two_clusters

    p1 = canonical_model.generate_gas_particles(20_000, prng=11)
    p2 = canonical_model.generate_gas_particles(20_000, prng=12)
    parts = combine_two_clusters(p1, p2, canonical_model, canonical_model,
                                 [-3000.0, 0, 0], [3000.0, 0, 0],
                                 [100.0, 0, 0], [-100.0, 0, 0])
    e = np.asarray(parts["gas", "thermal_energy"])
    d = np.asarray(parts["gas", "density"])
    assert np.isfinite(e).all() and (e > 0).all()
    assert np.isfinite(d).all() and (d > 0).all()
