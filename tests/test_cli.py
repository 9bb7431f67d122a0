"""CLI coverage: every subcommand end-to-end at toy sizes, in-process
(`cli.main(argv)`), including the error paths that must exit non-zero.
The reference has no CLI; this is rebuild productization (cli.py)."""

import json

import h5py
import numpy as np
import pytest

from cluster_generator_tpu.cli import main

NP = 128  # model grid points: small but enough for stable HSE/DF


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_model")
    fn = str(d / "model.h5")
    assert main(["build", "--m200", "1.2e15", "--conc", "4.5",
                 "--num-points", str(NP), "--beta", "100",
                 "-o", fn]) == 0
    return fn


def test_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "cluster_generator_tpu" in out and "backend=" in out


def test_build_writes_loadable_model(model_file):
    from cluster_generator_tpu.model import ClusterModel

    m = ClusterModel.from_h5_file(model_file)
    assert m.num_elements == NP
    for f in ("density", "temperature", "dark_matter_density",
              "magnetic_field_strength"):
        assert f in m, f
    # the DF is persisted ONCE, as the canonical top-level dataset the
    # loader resumes from — not duplicated as a bogus radial field
    with h5py.File(model_file) as f:
        assert "dm_df" in f and "dm_df" not in f["fields"]
    assert m._dm_virial is not None  # resumed, not recomputed
    # at 128 grid points the boundary spline derivative is coarse; the
    # interior residual is what HSE certifies (1e-4 at >=1000 pts is
    # pinned by tests/test_model.py on the canonical grid)
    assert float(np.abs(m.check_hse())[2:-2].max()) < 1e-2


def test_particles_native_and_gadget(model_file, tmp_path):
    fn = str(tmp_path / "parts.h5")
    assert main(["particles", model_file, "--dm", "4000", "--gas", "2000",
                 "--star", "500", "--tracer", "200", "--r-max", "5000",
                 "-o", fn]) == 0
    from cluster_generator_tpu.particles import ClusterParticles

    p = ClusterParticles.from_file(fn)
    assert p.num_particles == {"dm": 4000, "gas": 2000, "star": 500,
                               "tracer": 200}

    gd = str(tmp_path / "snap.h5")
    # r_max must fit the half-box or the writer (loudly) clips
    assert main(["particles", model_file, "--dm", "1000", "--r-max",
                 "5000", "--gadget", "14000", "-o", gd]) == 0
    with h5py.File(gd) as f:
        assert f["Header"].attrs["NumPart_ThisFile"][1] == 1000
        pos = f["PartType1/Coordinates"][()]
    assert 6000 < pos.mean() < 8000  # centered at box/2

    # no counts -> usage error
    assert main(["particles", model_file, "-o",
                 str(tmp_path / "x.h5")]) == 2


def test_ics_subcommand(model_file, tmp_path):
    from cluster_generator_tpu.ics import ClusterICs

    yml = str(tmp_path / "scene.yaml")
    ClusterICs("cli_demo", 2, [model_file, model_file],
               [[-1000.0, 0.0, 0.0], [1000.0, 0.0, 0.0]],
               [[200.0, 0.0, 0.0], [-200.0, 0.0, 0.0]],
               num_particles={"dm": 3000, "gas": 1500, "star": 400},
               r_max=4000.0).to_file(yml, overwrite=True)
    out = str(tmp_path / "merger.h5")
    assert main(["ics", yml, "-o", out]) == 0
    # per-halo particle caches land NEXT TO the output, not in cwd
    assert (tmp_path / "cli_demo_0_particles.h5").exists()
    from cluster_generator_tpu.particles import ClusterParticles

    p = ClusterParticles.from_file(out)
    assert p.num_particles["dm"] == 3000
    assert set(p.particle_types) == {"dm", "gas", "star"}


@pytest.mark.slow
def test_datagen_verify_roundtrip(tmp_path, capsys):
    cat = str(tmp_path / "cat.h5")
    assert main(["datagen", "-n", "4", "--dm", "600", "--gas", "400",
                 "--star", "150", "--batch-size", "2",
                 "--num-points", str(NP), "-o", cat]) == 0
    capsys.readouterr()  # drop the datagen chatter
    assert main(["verify", cat]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["n_clusters_checked"] == 4
    assert report["violations"] == []

    # corrupt one dataset -> verify exits 1 and names the violation
    with h5py.File(cat, "a") as f:
        d = f["cluster_000002/gas_thermal_energy"]
        d[...] = np.asarray(d[()]) * 3.0
    assert main(["verify", cat]) == 1
    assert "thermal energy" in capsys.readouterr().out

    # DM-only product + resume flag on a complete catalog (no-op)
    cat2 = str(tmp_path / "cat_dm.h5")
    assert main(["datagen", "-n", "3", "--dm", "500", "--batch-size", "2",
                 "--num-points", str(NP), "-o", cat2]) == 0
    assert main(["datagen", "-n", "3", "--dm", "500", "--batch-size", "2",
                 "--num-points", str(NP), "-o", cat2, "--resume"]) == 0

    # usage errors
    assert main(["datagen", "-n", "2", "-o", cat2]) == 2
    assert main(["datagen", "-n", "2", "--prorate", "1000", "--dm", "5",
                 "-o", cat2]) == 2
    assert main(["datagen", "-n", "2", "--dm", "10", "--rank", "0",
                 "-o", cat2]) == 2  # --rank without --nproc


def test_catalog_inspect_and_multihost(tmp_path, capsys):
    # two shards of one 5-cluster run via --rank/--nproc
    base = str(tmp_path / "mh.h5")
    for r in (0, 1):
        assert main(["datagen", "-n", "5", "--dm", "300",
                     "--batch-size", "2", "--num-points", str(NP),
                     "-o", base, "--rank", str(r), "--nproc", "2"]) == 0
    shards = [str(tmp_path / f"mh.{r}of2.h5") for r in (0, 1)]
    capsys.readouterr()
    assert main(["catalog"] + shards) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["n_clusters"] == 5 and info["groups_present"] == 5
    assert info["complete"] is True
    assert main(["verify"] + shards) == 0

    # a lost shard must NOT pass the completeness gate: supplying only
    # rank 0 of 2 exits 1 and names the missing rank
    capsys.readouterr()
    assert main(["catalog", shards[0]]) == 1
    info = json.loads(capsys.readouterr().out)
    assert info["missing_shard_ranks"] == [1]

    # a bare --indices (flag with no values) is an argparse error, not a
    # vacuous zero-cluster pass of the QA gate
    with pytest.raises(SystemExit):
        main(["verify", shards[0], "--indices"])

    # a plain catalog missing groups is flagged
    with h5py.File(shards[0], "a") as f:
        f.attrs["shard_count"] = 1
    capsys.readouterr()
    assert main(["catalog", shards[0]]) == 1


def test_grid_subcommand(model_file, tmp_path):
    fn = str(tmp_path / "grid.h5")
    assert main(["grid", model_file, "--dims", "32", "--chunksize", "16",
                 "--dtype", "f4", "-o", fn]) == 0
    with h5py.File(fn) as f:
        assert f["grid/density"].dtype == np.dtype("f4")
        assert f.attrs["chunksize"] == 16


@pytest.mark.slow
def test_mergers_subcommand(tmp_path, capsys):
    from cluster_generator_tpu.parallel.mergers import read_merger_catalog

    cat = str(tmp_path / "mergers.h5")
    assert main(["mergers", "-n", "3", "--dm", "400", "--gas", "300",
                 "--batch-size", "2", "--num-points", str(NP),
                 "-o", cat]) == 0
    capsys.readouterr()
    # the catalog inspector understands scene_ groups
    assert main(["catalog", cat]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["n_clusters"] == 3 and info["groups_present"] == 3
    assert info["complete"] is True
    assert info["files"][0]["attrs"]["product"] == "merger_scenes"

    # scenes carry both halos' species segments and finite draws
    for _, scene in read_merger_catalog(cat, indices=[1]):
        assert scene["dm_position"].shape == (400, 3)
        assert scene["gas_thermal_energy"].shape == (300,)
        assert np.isfinite(scene["dm_velocity"]).all()
        assert scene["M200"].shape == (2,)

    # resume on a complete catalog is a no-op; usage errors exit 2
    assert main(["mergers", "-n", "3", "--dm", "400", "--gas", "300",
                 "--batch-size", "2", "--num-points", str(NP),
                 "-o", cat, "--resume"]) == 0
    assert main(["mergers", "-n", "2", "-o", cat]) == 2
    assert main(["mergers", "-n", "2", "--dm", "10", "--rank", "0",
                 "-o", cat]) == 2

    # multihost shards reassemble under the inspector
    base = str(tmp_path / "mh_sc.h5")
    for r in (0, 1):
        assert main(["mergers", "-n", "3", "--dm", "200",
                     "--batch-size", "1", "--num-points", str(NP),
                     "-o", base, "--rank", str(r), "--nproc", "2"]) == 0
    shards = [str(tmp_path / f"mh_sc.{r}of2.h5") for r in (0, 1)]
    capsys.readouterr()
    assert main(["catalog"] + shards) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["groups_present"] == 3 and info["complete"] is True
