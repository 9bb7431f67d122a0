"""Edge-case coverage: gasless models, BH in Gadget files, tracers,
mass-table-only Gadget reads, reprs."""

import h5py
import numpy as np
import pytest

import cluster_generator_tpu as cg


def test_no_gas_check_hse_raises(canonical_profiles):
    m = cg.ClusterModel.no_gas(0.1, 1.0e4, canonical_profiles["rhot"])
    with pytest.raises(RuntimeError):
        m.check_hse()


def test_no_gas_dm_particles(canonical_profiles):
    m = cg.ClusterModel.no_gas(1.0, 1.0e4, canonical_profiles["rhot"],
                               num_points=500)
    p = m.generate_dm_particles(20_000, prng=1)
    assert p.num_particles["dm"] == 20_000
    v = np.linalg.norm(p["dm", "particle_velocity"], axis=1)
    assert (v > 0).all() and np.isfinite(v).all()


def test_gadget_black_hole_and_tracer(canonical_model, tmp_path):
    p = canonical_model.generate_dm_particles(1000, prng=2)
    p = p + canonical_model.generate_tracer_particles(500, prng=3)
    p.add_black_hole(3.0e9, pos=[10.0, 10.0, 10.0])
    p.add_offsets([7000.0] * 3, [0.0] * 3)
    fn = str(tmp_path / "bh.h5")
    p.write_to_gadget_file(fn, 14000.0, overwrite=True)
    with h5py.File(fn) as f:
        assert "PartType5" in f  # black hole
        assert "PartType2" in f  # tracer, Coordinates only
        assert list(f["PartType2"].keys()) == ["Coordinates", "ParticleIDs"]
        assert f["Header"].attrs["NumPart_ThisFile"][5] == 1
        assert f["Header"].attrs["MassTable"][5] > 0


def test_gadget_masstable_read(tmp_path):
    """Reading a snapshot whose DM masses come from the header MassTable
    (particles.py:327-334)."""
    fn = str(tmp_path / "mt.h5")
    n = 100
    with h5py.File(fn, "w") as f:
        g = f.create_group("PartType1")
        g.create_dataset("Coordinates", data=np.random.rand(n, 3) * 100)
        g.create_dataset("Velocities", data=np.zeros((n, 3)))
        g.create_dataset("ParticleIDs", data=np.arange(n, dtype="uint32"))
        h = f.create_group("Header")
        mt = np.zeros(6)
        mt[1] = 0.5  # 0.5e10 Msun per particle
        h.attrs["MassTable"] = mt
        h.attrs["BoxSize"] = 100.0
    p = cg.ClusterParticles.from_gadget_file(fn)
    assert np.allclose(p["dm", "particle_mass"], 0.5e10)


def test_reprs(canonical_model):
    assert "ClusterModel" in repr(canonical_model)
    p = canonical_model.generate_tracer_particles(100, prng=1)
    assert "tracer" in repr(p)


def test_cutoff_profile_model():
    """Model built from a cutoff profile stays positive and finite —
    exercises the logistic truncation in a real build."""
    rhot = cg.snfw_density_profile(1.2e15, 500.0)
    rhog = cg.vikhlinin_density_profile(1.0e5, 100.0, 1000.0, 1.0, 0.67,
                                        3).cutoff(3000.0, k=5)
    m = cg.ClusterModel.from_dens_and_tden(0.1, 5000.0, rhog, rhot,
                                           num_points=500)
    assert (np.asarray(m["pressure"]) > 0).all()
    assert np.isfinite(np.asarray(m["temperature"])).all()


def test_sub_sample_collisionless(canonical_model):
    p = canonical_model.generate_dm_particles(8000, sub_sample=4, prng=9)
    r = np.linalg.norm(p["dm", "particle_position"], axis=1)
    assert np.allclose(r[:2000], r[2000:4000], rtol=1e-12)
    v = np.linalg.norm(p["dm", "particle_velocity"], axis=1)
    assert np.allclose(v[:2000], v[2000:4000], rtol=1e-12)


def test_model_ascii_cgs(canonical_model, tmp_path):
    fn = str(tmp_path / "m.dat")
    canonical_model.write_model_to_ascii(fn, in_cgs=True)
    txt = open(fn).read()
    assert "unit_system=cgs" in txt


def test_mass_in_radius_below_grid(canonical_model):
    """A radius below the first grid point returns zeros instead of the
    reference's bare IndexError (reference model.py:1088-1107)."""
    r0 = float(canonical_model["radius"][0])
    masses = canonical_model.mass_in_radius(0.5 * r0)
    assert set(masses) >= {"total", "gas", "dark_matter"}
    for v in masses.values():
        assert float(v) == 0.0
    # and a normal radius still returns increasing positive masses
    inside = canonical_model.mass_in_radius(100.0)
    assert all(float(v) > 0 for v in inside.values())


def test_find_radius_for_density_monotone_guard(canonical_model):
    """Non-monotone gas density raises instead of silently interpolating
    garbage (reference model.py:1109-1113)."""
    import copy

    d0 = float(canonical_model.find_field_at_radius("density", 500.0))
    r = canonical_model.find_radius_for_density(d0)
    assert np.isclose(r, 500.0, rtol=1e-3)

    bad = copy.deepcopy(canonical_model)
    dens = np.asarray(bad.fields["density"]).copy()
    dens[10] = dens[9] * 2.0  # create a local bump
    bad.fields["density"] = dens
    with pytest.raises(ValueError, match="monoton"):
        bad.find_radius_for_density(d0)


def test_speed_cap_at_local_escape(canonical_model):
    """Joint-table speed draws are capped at the LOCAL escape speed
    sqrt(2 psi(r)) (the Bernoulli row selection can otherwise exceed it
    by the inter-node v_esc difference)."""
    p = canonical_model.generate_dm_particles(50_000, prng=11,
                                              compute_potential=True)
    v = np.linalg.norm(np.asarray(p["dm", "particle_velocity"]), axis=1)
    psi = -np.asarray(p["dm", "particle_potential"])
    v_esc = np.sqrt(2.0 * psi)
    assert (v <= v_esc * (1.0 + 1e-12)).all()


def test_gadget_writer_warns_on_out_of_box_clipping(tmp_path, caplog):
    """Gadget boxes start at the origin; an origin-centered scene loses
    the negative octants silently in the reference — here the writer
    logs a loud warning when >5% of a species is dropped (and still
    writes the in-box remainder)."""
    import logging

    import h5py

    from cluster_generator_tpu.particles import ClusterParticles

    rng = np.random.default_rng(3)
    pos = rng.uniform(-500.0, 500.0, (4000, 3))  # origin-centered
    parts = ClusterParticles(["dm"], {
        ("dm", "particle_position"): pos,
        ("dm", "particle_velocity"): np.zeros_like(pos),
        ("dm", "particle_mass"): np.full(4000, 1.0e8),
    })
    fn = str(tmp_path / "clip.h5")
    # mylog doesn't propagate (core/logging.py); capture via a handler
    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    from cluster_generator_tpu.core.logging import mylog

    h = _Catch(level=logging.WARNING)
    mylog.addHandler(h)
    try:
        parts.write_to_gadget_file(fn, 1000.0)
    finally:
        mylog.removeHandler(h)
    assert any("outside the box" in m for m in records)
    with h5py.File(fn) as f:
        n = f["PartType1"]["Coordinates"].shape[0]
    inside = ((pos >= 0) & (pos <= 1000.0)).all(axis=1).sum()
    assert n == inside > 0
