"""ClusterICs: binary geometry, particle pro-rating, caching, YAML
round-trip, full single/binary pipelines (reference tests/test_ics.py)."""

import os

import numpy as np
import pytest

import cluster_generator_tpu as cg


@pytest.fixture(scope="module")
def profile_file(canonical_model, tmp_path_factory):
    d = tmp_path_factory.mktemp("ics")
    fn = str(d / "profile1.h5")
    _ = canonical_model.dm_virial
    _ = canonical_model.star_virial
    canonical_model.write_model_to_h5(fn)
    return fn


def test_compute_centers_for_binary():
    """Closed-form geometry check (reference test_ics.py:160-173)."""
    c1, c2 = cg.compute_centers_for_binary([0.0, 0.0, 0.0], 3000.0, 500.0,
                                           a=100.0)
    diff = np.asarray(c2) - np.asarray(c1)
    assert np.hypot(np.hypot(diff[0], diff[1]), diff[2]) == pytest.approx(3000.0)
    assert diff[1] == pytest.approx(500.0)
    assert diff[2] == pytest.approx(100.0)
    assert np.allclose((np.asarray(c1) + np.asarray(c2)) / 2, 0.0)


def test_num_particle_prorating(profile_file):
    ics = cg.ClusterICs("t", 2, [profile_file, profile_file],
                        [[0, 0, 0], [3000, 0, 0]],
                        [[0, 0, 0], [0, 0, 0]],
                        num_particles={"dm": 10000, "gas": 5000, "star": 2000},
                        r_max=5000.0)
    # identical halos -> even split
    assert ics.num_particles["dm"] == [5000, 5000]
    assert ics.num_particles["gas"] == [2500, 2500]
    assert ics.num_particles["star"] == [1000, 1000]


def test_single_cluster_ics(profile_file, tmp_path):
    ics = cg.ClusterICs("single", 1, [profile_file], [5000.0, 5000.0, 5000.0],
                        [0.0, 0.0, 0.0],
                        num_particles={"dm": 4000, "gas": 2000}, r_max=3000.0)
    parts = ics.setup_particle_ics(output_directory=str(tmp_path), prng=5)
    assert parts.num_particles["dm"] == 4000
    assert parts.num_particles["gas"] == 2000
    r = np.linalg.norm(parts["dm", "particle_position"] - 5000.0, axis=1)
    assert r.max() <= 3000.0 * 1.001


def test_binary_ics_and_cache(profile_file, tmp_path):
    c1, c2 = cg.compute_centers_for_binary([7000.0] * 3, 3000.0, 500.0)
    ics = cg.ClusterICs("binary", 2, [profile_file, profile_file], [c1, c2],
                        [[0.3, 0, 0], [-0.3, 0, 0]],
                        num_particles={"dm": 8000, "gas": 4000},
                        r_max=4000.0)
    parts = ics.setup_particle_ics(output_directory=str(tmp_path), prng=6)
    assert parts.num_particles["dm"] == 8000
    assert parts.num_particles["gas"] == 4000
    # caching: particle files recorded and reused
    assert ics.particle_files[0] is not None
    assert os.path.exists(ics.particle_files[0])
    parts2 = ics.setup_particle_ics(output_directory=str(tmp_path), prng=99)
    # cached halos -> same pre-offset draw reloaded (same combined result)
    assert np.allclose(np.sort(parts2["dm", "particle_mass"]),
                       np.sort(parts["dm", "particle_mass"]))


def test_yaml_roundtrip(profile_file, tmp_path):
    fn = str(tmp_path / "ics.yaml")
    c1, c2 = cg.compute_centers_for_binary([7000.0] * 3, 3000.0, 500.0)
    ics = cg.ClusterICs("yamltest", 2, [profile_file, profile_file], [c1, c2],
                        [[0.3, 0, 0], [-0.3, 0, 0]],
                        num_particles={"dm": 1000}, mag_file="b.h5",
                        r_max=4000.0)
    ics.to_file(fn)
    back = cg.ClusterICs.from_file(fn)
    assert back.basename == "yamltest"
    assert back.num_halos == 2
    assert np.allclose(back.center, ics.center)
    assert np.allclose(back.velocity, ics.velocity)
    assert back.tot_np["dm"] == 1000
    assert back.mag_file == "b.h5"
    with pytest.raises(RuntimeError):
        ics.to_file(fn)


def test_resample_particle_ics(profile_file, tmp_path):
    ics = cg.ClusterICs("rs", 1, [profile_file], [0.0, 0.0, 0.0],
                        [0.0, 0.0, 0.0], num_particles={"dm": 2000,
                                                        "gas": 2000},
                        r_max=3000.0)
    parts = ics.setup_particle_ics(output_directory=str(tmp_path), prng=8)
    new = ics.resample_particle_ics(parts)
    assert (new["gas", "density"] > 0).all()
    assert np.isfinite(new["gas", "thermal_energy"]).all()


def test_ics_create_dataset(profile_file, tmp_path):
    ics = cg.ClusterICs("ds2", 1, [profile_file], [0.0, 0.0, 0.0],
                        [0.0, 0.0, 0.0], num_particles={"dm": 100},
                        r_max=2000.0)
    fn = ics.create_dataset(str(tmp_path / "scene.h5"),
                            domain_dimensions=(32, 32, 32), chunksize=16)
    import h5py

    with h5py.File(fn) as f:
        assert f.attrs["model_count"] == 1
        assert (np.asarray(f["grid"]["density"][()]) > 0).any()


def test_triple_cluster_ics(profile_file, tmp_path):
    """Three-halo scene end-to-end: pro-rated counts over three halos,
    all species sampled around each center, gas mixed over H=3 halos
    (the static halo unroll in _sample_clusters/_mix must handle H>2),
    and the Gadget write/read round-trips."""
    centers = [[-2000.0, 0, 0], [2000.0, 0, 0], [0.0, 2500.0, 0]]
    vels = [[0.2, 0, 0], [-0.2, 0, 0], [0.0, -0.25, 0]]
    ics = cg.ClusterICs("triple", 3, [profile_file] * 3, centers, vels,
                        num_particles={"dm": 9000, "gas": 6000,
                                       "star": 3000}, r_max=3000.0)
    # output_directory keeps the per-halo particle caches out of the cwd
    parts = ics.setup_particle_ics(output_directory=str(tmp_path), prng=17)
    counts = parts.num_particles
    assert counts["dm"] == 9000 and counts["gas"] == 6000 \
        and counts["star"] == 3000

    pos = np.asarray(parts["dm", "particle_position"])
    # particles cluster around all three centers: each center has a
    # nontrivial share within r_max
    for ctr in centers:
        d = np.linalg.norm(pos - np.asarray(ctr), axis=1)
        frac = float((d < 3000.0).mean())
        assert frac > 0.2, (ctr, frac)
    # gas thermal energy finite and positive after 3-halo mixing
    e = np.asarray(parts["gas", "thermal_energy"])
    assert (e > 0).all() and np.isfinite(e).all()

    box = 16000.0
    parts.add_offsets([box / 2] * 3, [0.0] * 3)
    fn = str(tmp_path / "triple.h5")
    parts.write_to_gadget_file(fn, box)
    back = cg.ClusterParticles.from_gadget_file(fn)
    assert sum(back.num_particles.values()) == 18000


def test_particle_files_shorter_than_halos(profile_file, tmp_path,
                                           monkeypatch):
    """Passing fewer particle_files than halos leaves the missing slots
    None (a length-changing slice assignment used to SHRINK the 3-slot
    list and IndexError downstream) and regenerates just those halos."""
    monkeypatch.chdir(tmp_path)
    ics0 = cg.ClusterICs("pf", 1, [profile_file], [[0.0] * 3], [[0.0] * 3],
                         num_particles={"dm": 400}, r_max=3000.0)
    ics0._generate_particles()
    cached = ics0.particle_files[0]
    assert cached is not None

    ics = cg.ClusterICs("pf2", 2, [profile_file] * 2,
                        [[0.0] * 3, [3000.0, 0, 0]], [[0.0] * 3] * 2,
                        num_particles={"dm": 800}, r_max=3000.0,
                        particle_files=[cached])
    assert ics.particle_files == [cached, None, None]
    parts = ics._generate_particles()
    assert len(parts) == 2
    assert all(p.num_particles["dm"] > 0 for p in parts)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="particle_files"):
        cg.ClusterICs("pf3", 1, [profile_file], [[0.0] * 3], [[0.0] * 3],
                      num_particles={"dm": 400}, r_max=3000.0,
                      particle_files=[cached, cached])
