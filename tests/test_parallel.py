"""Multi-device scaling: ensemble vmap, sharded execution on the 8-device
virtual CPU mesh (SURVEY.md §2.3 / §7 step 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import cluster_generator_tpu as cg
from cluster_generator_tpu.parallel import (
    build_ensemble,
    make_mesh,
    sample_ensemble_params,
)
from cluster_generator_tpu.parallel.ensemble import build_one_cluster


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_build_one_cluster_matches_class_api(canonical_profiles):
    fields = build_one_cluster(1.5e15, 4.0, z=0.1, f_g=0.12, num_points=1000)
    m = cg.ClusterModel.from_dens_and_tden(
        0.1, 10000.0, canonical_profiles["rhog"], canonical_profiles["rhot"],
        stellar_density=canonical_profiles["rhos"])
    assert np.allclose(np.asarray(fields["total_mass"]),
                       np.asarray(m["total_mass"]), rtol=1e-8)
    assert np.allclose(np.asarray(fields["pressure"]),
                       np.asarray(m["pressure"]), rtol=1e-6)
    dfv = np.asarray(fields["dm_df"])
    assert np.allclose(dfv, m.dm_virial.df, rtol=1e-8)


def test_ensemble_vmap():
    M200 = jnp.asarray([1.0e15, 1.5e15, 2.0e15, 8.0e14])
    conc = jnp.asarray([4.0, 5.0, 6.0, 4.5])
    out = build_ensemble(M200, conc, num_points=256)
    assert out["total_mass"].shape == (4, 256)
    assert out["dm_df"].shape == (4, 256)
    assert np.isfinite(np.asarray(out["pressure"])).all()
    # each batch row equals the single-cluster build
    single = build_one_cluster(1.0e15, 4.0, num_points=256)
    assert np.allclose(np.asarray(out["total_mass"][0]),
                       np.asarray(single["total_mass"]), rtol=1e-10)


def test_ensemble_sharded_over_mesh():
    """Shard the parameter batch over the 'ens' axis; XLA runs each shard
    locally — output sharding matches input sharding."""
    mesh = make_mesh(n_ens=8)
    M200, conc = sample_ensemble_params(jax.random.key(0), 16)
    sharding = NamedSharding(mesh, P("ens"))
    M200 = jax.device_put(M200, sharding)
    conc = jax.device_put(conc, sharding)
    out = build_ensemble(M200, conc, num_points=128, with_df=False)
    assert out["total_mass"].shape == (16, 128)
    assert len(out["total_mass"].sharding.device_set) == 8
    assert np.isfinite(np.asarray(out["total_mass"])).all()


def test_sharded_particle_sampling(canonical_model):
    """Particle arrays shard over the full mesh; per-shard PRNG streams via
    fold_in produce independent draws."""
    mesh = make_mesh(n_ens=4, n_part=2)
    from cluster_generator_tpu.sampling import _truncated_cdf

    P_, rr, mtot = _truncated_cdf(canonical_model["radius"],
                                  canonical_model["dark_matter_mass"],
                                  r_max=5000.0)

    n_per = 1000
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(7), i))(
        jnp.arange(8))

    @jax.jit
    def sample_shard(key):
        u = jax.random.uniform(key, (n_per,), dtype=jnp.float64)
        return jnp.interp(u, jnp.asarray(P_), jnp.asarray(rr))

    radii = jax.vmap(sample_shard)(keys)
    assert radii.shape == (8, n_per)
    # shards are distinct streams
    assert not np.allclose(np.asarray(radii[0]), np.asarray(radii[1]))


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(n_ens=2, n_part=4)
    assert m2.devices.shape == (2, 4)
    assert m2.axis_names == ("ens", "part")


@pytest.mark.slow
def test_two_process_sharded_export(tmp_path):
    """TRUE multi-process sharded export: two ``jax.distributed`` CPU
    processes (4 virtual devices each, one global 8-shard mesh) run the
    sharded merger draw and each writes ONLY its addressable shards.
    Catches addressable-vs-global mistakes the single-host mesh tests
    cannot (parallel/export.py:9-23): every piece of snapshot-global
    metadata (file count, NumPart_Total, ID offsets) must come out
    identical in files written by processes that cannot see each other's
    shards."""
    import json
    import socket
    import subprocess
    import sys as _sys
    from pathlib import Path

    import h5py

    from cluster_generator_tpu.particles import ClusterParticles

    worker = Path(__file__).parent / "workers" / "sharded_export_worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in __import__("os").environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    procs = [subprocess.Popen(
        [_sys.executable, str(worker), str(i), "2", str(port),
         str(tmp_path)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    # each process wrote a disjoint half of the 8 shard files
    wrote = [set(json.loads((tmp_path / f"wrote.{i}.json").read_text()))
             for i in range(2)]
    assert len(wrote[0]) == 4 and len(wrote[1]) == 4
    assert not (wrote[0] & wrote[1]), wrote
    assert wrote[0] | wrote[1] == {f"ic.{k}.h5" for k in range(8)}

    # headers from DIFFERENT processes form one consistent snapshot
    totals, this_files, all_ids = [], [], []
    for k in range(8):
        with h5py.File(tmp_path / f"ic.{k}.h5", "r") as fo:
            hdr = fo["Header"].attrs
            assert hdr["NumFilesPerSnapshot"] == 8
            totals.append(np.asarray(hdr["NumPart_Total"]))
            this_files.append(np.asarray(hdr["NumPart_ThisFile"]))
            for pt in ("PartType0", "PartType1", "PartType4"):
                all_ids.append(fo[pt]["ParticleIDs"][:])
    assert all((t == totals[0]).all() for t in totals)
    np.testing.assert_array_equal(sum(this_files), totals[0])
    # the box clips some draws (box=5000 < 2*(500+3000)): totals must
    # reflect the collective post-clip counts, not the raw 64*8/species
    assert totals[0].sum() < 6 * 64 * 8
    assert totals[0].sum() > 0
    ids = np.concatenate(all_ids)
    assert len(np.unique(ids)) == len(ids)  # globally unique across hosts
    np.testing.assert_array_equal(np.sort(ids),
                                  np.arange(1, len(ids) + 1))

    # the union reassembles into the full particle set
    re = ClusterParticles.from_gadget_files(tmp_path / "ic.0.h5")
    assert sum(re.num_particles.values()) == int(totals[0].sum())


@pytest.mark.slow
def test_ensemble_datagen_streams_to_hdf5(tmp_path):
    """ensemble_datagen: cfg5b's batched datagen as a user API — one HDF5
    with a group per cluster, correct shapes/attrs, physical draws
    (radii within the grid, speeds below local escape), and batching
    that spans multiple vmapped batches."""
    import h5py

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(3), 6)
    fn = str(tmp_path / "datagen.h5")
    out = ensemble_datagen(M, c, fn, 2000, batch_size=4, num_points=128,
                           key=jax.random.key(9))
    assert out == fn
    with pytest.raises(IOError):
        ensemble_datagen(M, c, fn, 10)

    with h5py.File(fn) as f:
        assert f.attrs["n_clusters"] == 6
        names = sorted(f.keys())
        assert names == [f"cluster_{i:06d}" for i in range(6)]
        for i, name in enumerate(names):
            g = f[name]
            pos = g["particle_position"][()]
            vel = g["particle_velocity"][()]
            assert pos.shape == (2000, 3) and vel.shape == (2000, 3)
            assert pos.dtype == np.float32
            assert np.isfinite(pos).all() and np.isfinite(vel).all()
            r = np.linalg.norm(pos, axis=1)
            assert r.max() <= 10_000.0 * 1.001  # build grid rmax
            assert g.attrs["M200"] == pytest.approx(float(M[i]))
            assert g.attrs["particle_mass"] > 0
            # speeds bounded by the central escape speed (loose physical
            # sanity: v^2/2 < psi_max)
            v = np.linalg.norm(vel, axis=1)
            assert (v < 15.0).all()

    # different clusters are genuinely different draws
    with h5py.File(fn) as f:
        p0 = f["cluster_000000"]["particle_position"][()]
        p5 = f["cluster_000005"]["particle_position"][()]
    assert not np.allclose(p0, p5)


@pytest.mark.slow
def test_ensemble_datagen_full_species(tmp_path):
    """Full-species ensemble datagen (VERDICT r3 #1): gas + DM + stars per
    cluster, each species' radius distribution KS-tested against its exact
    mass-profile CDF, gas thermal energy consistent with 1.5 P / rho at
    the particle radius, DM speeds KS-consistent with the class-API draws,
    and every collisionless speed below the local escape speed."""
    import h5py
    from scipy.stats import ks_2samp, kstest

    from cluster_generator_tpu.parallel.ensemble import (
        build_one_cluster,
        ensemble_datagen,
        prorate_species_counts,
    )

    M200, conc, n_pts = 1.2e15, 5.0, 256
    fn = str(tmp_path / "full.h5")
    counts = {"dm": 20_000, "gas": 20_000, "star": 10_000}
    ensemble_datagen(np.array([M200]), np.array([conc]), fn, counts,
                     batch_size=1, num_points=n_pts, key=jax.random.key(2))

    fields = jax.jit(lambda m, c: build_one_cluster(
        m, c, num_points=n_pts, with_df=False))(M200, conc)
    rr = np.asarray(fields["radius"])

    with h5py.File(fn) as f:
        g = f["cluster_000000"]
        assert f.attrs["n_dm_per_cluster"] == counts["dm"]
        for sp, mass_field in [("dm", "dark_matter_mass"),
                               ("gas", "gas_mass"),
                               ("star", "stellar_mass")]:
            pos = g[f"{sp}_position"][()]
            assert pos.shape == (counts[sp], 3) and pos.dtype == np.float32
            r = np.linalg.norm(pos, axis=1)
            mm = np.asarray(fields[mass_field])
            cdf = lambda x: np.interp(x, rr, mm / mm[-1])
            stat, pval = kstest(np.float64(r), cdf)
            assert pval > 1e-3, (sp, stat, pval)
            # species particle mass = species total / count
            assert g.attrs[f"particle_mass_{sp}"] == pytest.approx(
                mm[-1] / counts[sp], rel=1e-5)

        # gas thermal energy tracks 1.5 P / rho at the particle radius
        r_gas = np.linalg.norm(g["gas_position"][()], axis=1)
        e = g["gas_thermal_energy"][()]
        e_grid = 1.5 * np.asarray(fields["pressure"]) / np.asarray(
            fields["density"])
        e_ref = np.interp(r_gas, rr, e_grid)
        assert np.median(np.abs(e - e_ref) / e_ref) < 2e-3
        assert (e > 0).all()

        # collisionless speeds below the LOCAL escape speed
        psi = -np.asarray(fields["gravitational_potential"])
        for sp in ("dm", "star"):
            r = np.linalg.norm(g[f"{sp}_position"][()], axis=1)
            v = np.linalg.norm(g[f"{sp}_velocity"][()], axis=1)
            v_esc = np.sqrt(2.0 * np.interp(r, rr, psi))
            assert (v <= v_esc * (1.0 + 1e-4)).all(), sp

        # DM speed distribution matches the class-API (VirialEquilibrium)
        # draws for the same model
        m = cg.ClusterModel.from_arrays(
            {k: np.asarray(v) for k, v in fields.items()})
        p = m.generate_dm_particles(counts["dm"], prng=7)
        v_cls = np.linalg.norm(
            np.asarray(p["dm", "particle_velocity"]), axis=1)
        v_ens = np.linalg.norm(np.float64(g["dm_velocity"][()]), axis=1)
        d, pval = ks_2samp(v_ens, v_cls)
        assert pval > 1e-3, (d, pval)

        # STAR speeds: the ensemble program uses the coarse star tables
        # (star_n_rows/star_rq/star_n_s/star_n_q defaults) while the
        # class API builds full-resolution tables — KS agreement pins the
        # coarse-table error below the 1/sqrt(n) statistical floor
        p_s = m.generate_star_particles(counts["star"], prng=8)
        v_cls_s = np.linalg.norm(
            np.asarray(p_s["star", "particle_velocity"]), axis=1)
        v_ens_s = np.linalg.norm(np.float64(g["star_velocity"][()]), axis=1)
        d, pval = ks_2samp(v_ens_s, v_cls_s)
        assert pval > 1e-3, (d, pval)

    # pro-rata helper: counts sum to the total, dominated by dm
    pr = prorate_species_counts(10_000, num_points=128)
    assert sum(pr.values()) == 10_000
    assert pr["dm"] > pr["gas"] > pr["star"] > 0


def test_ensemble_datagen_rejects_unknown_species(tmp_path):
    """A typo'd species key must raise, not silently drop the species
    (round-4 review finding)."""
    from cluster_generator_tpu.parallel import ensemble_datagen

    with pytest.raises(ValueError, match="unknown species"):
        ensemble_datagen(np.array([1e15]), np.array([5.0]),
                         str(tmp_path / "x.h5"),
                         {"dm": 100, "stars": 10})


@pytest.mark.slow
def test_dm_only_datagen_caps_speeds_at_local_escape():
    """The int-count (DM-only) datagen path shares the full-species
    core, including the local escape-speed cap (round-4 review: the two
    paths had diverged on it)."""
    from cluster_generator_tpu.parallel.ensemble import (
        _datagen_batch_fn,
        build_one_cluster,
    )

    n_pts = 256
    fn = _datagen_batch_fn(n_pts, 20_000)
    M, c = jnp.asarray([1.2e15]), jnp.asarray([5.0])
    pos, vel, pm = fn(M, c, jax.random.key(0))
    fields = jax.jit(lambda m, cc: build_one_cluster(
        m, cc, num_points=n_pts, with_df=False))(M[0], c[0])
    rr = np.asarray(fields["radius"])
    psi = -np.asarray(fields["gravitational_potential"])
    r = np.linalg.norm(np.asarray(pos[0]), axis=1)
    v = np.linalg.norm(np.asarray(vel[0]), axis=1)
    v_esc = np.sqrt(2.0 * np.interp(r, rr, psi))
    assert (v <= v_esc * (1.0 + 1e-4)).all()


@pytest.mark.slow
def test_int_and_dict_datagen_paths_agree_exactly():
    """The int-count path IS the full-species core with gas=star=0 —
    same key must give bit-identical DM draws through both entries."""
    from cluster_generator_tpu.parallel.ensemble import (
        _datagen_batch_fn,
        _datagen_full_batch_fn,
    )

    M, c = jnp.asarray([1.1e15]), jnp.asarray([4.5])
    key = jax.random.key(12)
    out_i = _datagen_batch_fn(128, 3000)(M, c, key)
    out_d = _datagen_full_batch_fn(128, 3000, 0, 0)(M, c, key)["dm"]
    for a, b in zip(out_i, out_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_read_catalog_roundtrip(tmp_path):
    """read_catalog yields every dataset + attr of each cluster group,
    byte-identical to a direct h5py read, honoring an index subset."""
    import h5py

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(5), 5)
    fn = str(tmp_path / "cat.h5")
    ensemble_datagen(M, c, fn, {"dm": 800, "gas": 600, "star": 200},
                     batch_size=3, num_points=128)

    got = dict(read_catalog(fn))
    assert sorted(got) == list(range(5))
    with h5py.File(fn) as f:
        for i in range(5):
            g = f[f"cluster_{i:06d}"]
            assert set(g.keys()) <= set(got[i])
            for k in g:
                np.testing.assert_array_equal(got[i][k], g[k][()], err_msg=k)
            for k, v in g.attrs.items():
                assert got[i][k] == v, k

    subset = [ix for ix, _ in read_catalog(fn, indices=[3, 1])]
    assert subset == [3, 1]


@pytest.mark.slow
def test_verify_catalog_qa_gate(tmp_path):
    """verify_catalog passes a clean catalog (both product forms, incl.
    a shard list) and catches injected corruption: superluminal speeds,
    wrong thermal energies, out-of-grid radii, a broken mass budget."""
    import h5py

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        ensemble_datagen_multihost,
        sample_ensemble_params,
        verify_catalog,
    )

    M, c = sample_ensemble_params(jax.random.key(41), 4)
    kw = dict(batch_size=2, num_points=128, key=jax.random.key(3))
    full = str(tmp_path / "full.h5")
    ensemble_datagen(M, c, full, {"dm": 400, "gas": 300, "star": 100},
                     **kw)
    rep = verify_catalog(full)
    assert rep["violations"] == []
    assert rep["n_clusters_checked"] == 4
    assert rep["n_particles_checked"] == 4 * 800
    assert rep["max_speed_frac"] <= 1.0 + 5e-3
    assert 0 < rep["max_energy_rel_err"] <= 2e-2
    assert abs(rep["max_mass_rel_err"]) <= 1e-5

    dm = str(tmp_path / "dm.h5")
    ensemble_datagen(M, c, dm, 500, **kw)
    assert verify_catalog(dm)["violations"] == []

    shards = [ensemble_datagen_multihost(M, c, str(tmp_path / "s.h5"),
                                         500, rank=r, nproc=2, **kw)
              for r in range(2)]
    assert verify_catalog(shards)["violations"] == []

    # inject corruption: each must be caught and named
    with h5py.File(full, "r+") as f:
        g = f["cluster_000001"]
        v = g["dm_velocity"][()]
        v[7] *= 50.0  # way past escape speed
        g["dm_velocity"][...] = v
        e = g["gas_thermal_energy"][()]
        e[3] *= 2.0
        g["gas_thermal_energy"][...] = e
        p = g["star_position"][()]
        p[0] = [50000.0, 0.0, 0.0]  # outside the radial grid
        g["star_position"][...] = p
        g.attrs["particle_mass_dm"] = g.attrs["particle_mass_dm"] * 1.1
    with pytest.raises(ValueError, match="physics QA"):
        verify_catalog(full)
    rep = verify_catalog(full, strict=False)
    text = "\n".join(rep["violations"])
    assert "speed" in text and "thermal energy" in text
    assert "radius" in text and "mass budget" in text


@pytest.mark.slow
def test_multihost_datagen_shards_reassemble_bit_identical(tmp_path):
    """ensemble_datagen_multihost: N processes write strided batch
    shards with GLOBAL cluster indices; the shard set reassembles
    bit-identical to the single-process catalog through read_catalog /
    catalog_batches (keys fold on the global batch offset — no
    coordinator or collectives needed).  Shards resume independently."""
    import h5py
    import pytest

    from cluster_generator_tpu.parallel import (
        catalog_batches,
        ensemble_datagen,
        ensemble_datagen_multihost,
        read_catalog,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(31), 10)
    kw = dict(n_particles_per_cluster={"dm": 300, "gas": 200, "star": 80},
              batch_size=2, num_points=128, key=jax.random.key(17))
    single = str(tmp_path / "cat.h5")
    ensemble_datagen(M, c, single, **kw)
    ref = dict(read_catalog(single))

    # 3 "processes" (ranks run sequentially here; the math has no
    # cross-process coupling, so this is exactly the multihost run)
    shards = [ensemble_datagen_multihost(M, c, str(tmp_path / "cat.h5"),
                                         rank=r, nproc=3, **kw)
              for r in range(3)]
    assert sorted(shards) == sorted(
        str(tmp_path / f"cat.{r}of3.h5") for r in range(3))
    got = dict(read_catalog(shards))
    assert sorted(got) == sorted(ref)
    for i in ref:
        for k in ref[i]:
            np.testing.assert_array_equal(got[i][k], ref[i][k],
                                          err_msg=f"cluster {i} {k}")
    # strided assignment: shard 0 carries batches 0 and 6 -> clusters
    # 0,1,6,7 (global names)
    with h5py.File(shards[0]) as f:
        assert sorted(k for k in f if k.startswith("cluster_")) == [
            "cluster_000000", "cluster_000001",
            "cluster_000006", "cluster_000007"]
        assert f.attrs["shard_rank"] == 0 and f.attrs["shard_count"] == 3

    # batched consumption over the shard set matches the single file
    b_single = list(catalog_batches(single, 5))
    b_shards = list(catalog_batches(shards, 5))
    for b1, b2 in zip(b_single, b_shards):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)

    # a shard resumes independently (drop rank 1's last batch)
    with h5py.File(shards[1], "a") as f:
        del f.attrs["complete"]
        del f["cluster_000008"]
        del f["cluster_000009"]
    ensemble_datagen_multihost(M, c, str(tmp_path / "cat.h5"),
                               rank=1, nproc=3, resume=True, **kw)
    got2 = dict(read_catalog(shards))
    for k in ref[8]:
        np.testing.assert_array_equal(got2[8][k], ref[8][k], err_msg=k)

    with pytest.raises(ValueError, match="rank"):
        ensemble_datagen_multihost(M, c, str(tmp_path / "x.h5"),
                                   rank=3, nproc=3, **kw)


@pytest.mark.slow
def test_multihost_datagen_two_real_processes(tmp_path):
    """Two actual OS processes each write their shard concurrently (no
    jax.distributed needed — datagen is embarrassingly parallel); the
    shard set must reassemble the full ensemble."""
    import subprocess
    import sys
    from pathlib import Path

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
    )

    code = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from cluster_generator_tpu.parallel import (ensemble_datagen_multihost,
                                            sample_ensemble_params)
M, c = sample_ensemble_params(jax.random.key(31), 6)
ensemble_datagen_multihost(M, c, {fn!r}, 500, batch_size=2,
                           num_points=128, key=jax.random.key(2),
                           rank=int(sys.argv[1]), nproc=2)
"""
    import os as _os
    fn = str(tmp_path / "mh.h5")
    env = dict(_os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PYTHONPATH", None)
    root = str(Path(__file__).resolve().parents[1])
    procs = [subprocess.Popen(
        [sys.executable, "-c", code.format(root=root, fn=fn), str(r)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for r in range(2)]
    for p in procs:
        _, err = p.communicate(timeout=420)
        assert p.returncode == 0, err.decode()[-2000:]

    shards = [str(tmp_path / f"mh.{r}of2.h5") for r in range(2)]
    M, c = sample_ensemble_params(jax.random.key(31), 6)
    single = str(tmp_path / "single.h5")
    ensemble_datagen(M, c, single, 500, batch_size=2, num_points=128,
                     key=jax.random.key(2))
    ref = dict(read_catalog(single))
    got = dict(read_catalog(shards))
    assert sorted(got) == list(range(6))
    for i in ref:
        np.testing.assert_array_equal(got[i]["particle_velocity"],
                                      ref[i]["particle_velocity"], err_msg=str(i))


@pytest.mark.slow
def test_datagen_batches_streams_identical_draws(tmp_path):
    """datagen_batches (the no-disk streaming form) yields exactly the
    draws ensemble_datagen writes for the same config — both the DM-only
    and the full-species product — and an incomplete catalog read names
    resume=True in its error."""
    import h5py
    import pytest

    from cluster_generator_tpu.parallel import (
        datagen_batches,
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(14), 5)
    kw = dict(batch_size=2, num_points=128, key=jax.random.key(8))
    fn = str(tmp_path / "cat.h5")
    ensemble_datagen(M, c, fn, {"dm": 300, "gas": 200, "star": 80}, **kw)
    singles = dict(read_catalog(fn))
    seen = 0
    for b0, out in datagen_batches(M, c, {"dm": 300, "gas": 200,
                                          "star": 80}, **kw):
        for j in range(out["dm"][0].shape[0]):
            i = b0 + j
            np.testing.assert_array_equal(np.asarray(out["dm"][0][j]),
                                          singles[i]["dm_position"])
            np.testing.assert_array_equal(np.asarray(out["gas"][1][j]),
                                          singles[i]["gas_thermal_energy"])
            seen += 1
    assert seen == 5

    # DM-only product streams too
    fn2 = str(tmp_path / "dm.h5")
    ensemble_datagen(M, c, fn2, 400, **kw)
    singles2 = dict(read_catalog(fn2))
    for b0, (pos, vel, pm) in datagen_batches(M, c, 400, **kw):
        for j in range(pos.shape[0]):
            np.testing.assert_array_equal(
                np.asarray(vel[j]), singles2[b0 + j]["particle_velocity"])

    # incomplete catalog: loud, actionable error
    with h5py.File(fn, "a") as f:
        del f["cluster_000004"]
    with pytest.raises(KeyError, match="resume=True"):
        dict(read_catalog(fn))


@pytest.mark.slow
def test_ensemble_datagen_mesh_sharded_matches_single_device(tmp_path):
    """ensemble_datagen(mesh=...) shards each batch over the 'ens' axis
    (8 virtual devices); the catalog must match the single-device run to
    f32 rounding (~1 ulp: XLA fuses the partitioned program
    differently), including the non-dividing final batch that falls
    back to default placement.

    Runs in a fresh subprocess (workers/mesh_datagen_worker.py): the
    mesh-sharded pjit compile segfaults the XLA CPU compiler when the
    process carries the live-executable state of ~210 preceding tests
    (round-4 full-suite reproducer; passes in isolation), so the
    compile gets its own interpreter like the two-process tests."""
    import os
    import subprocess
    import sys as _sys
    from pathlib import Path

    worker = Path(__file__).parent / "workers" / "mesh_datagen_worker.py"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    res = subprocess.run([_sys.executable, str(worker), str(tmp_path)],
                         env=env, capture_output=True, text=True,
                         timeout=900)
    assert res.returncode == 0, (res.stdout + res.stderr)[-3000:]
    assert "MESH_DATAGEN_OK" in res.stdout


def test_ensemble_datagen_resume_is_bit_identical(tmp_path):
    """resume=True recomputes only missing/partial batches, and the
    spliced catalog is bit-identical to an uninterrupted run (keys fold
    on the batch offset, so per-batch draws are position-independent).
    Config mismatches refuse to splice; a complete catalog returns
    immediately; resume+overwrite is rejected."""
    import h5py
    import pytest

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(4), 7)
    kw = dict(n_particles_per_cluster={"dm": 300, "gas": 200, "star": 80},
              batch_size=2, num_points=128, key=jax.random.key(11))
    ref_fn = str(tmp_path / "ref.h5")
    ensemble_datagen(M, c, ref_fn, **kw)
    ref = dict(read_catalog(ref_fn))

    # simulate a crash: drop the last two batches entirely and one
    # dataset of a mid-file cluster (a partially-written batch)
    cut_fn = str(tmp_path / "cut.h5")
    ensemble_datagen(M, c, cut_fn, **kw)
    with h5py.File(cut_fn, "a") as f:
        del f.attrs["complete"]
        for i in (4, 5, 6):
            del f[f"cluster_{i:06d}"]
        del f["cluster_000003"]["star_velocity"]

    with pytest.raises(IOError, match="resume=True"):
        ensemble_datagen(M, c, cut_fn, **kw)  # overwrite-refusal hint
    ensemble_datagen(M, c, cut_fn, resume=True, **kw)
    got = dict(read_catalog(cut_fn))
    assert sorted(got) == sorted(ref)
    for i in ref:
        for k in ref[i]:
            np.testing.assert_array_equal(got[i][k], ref[i][k],
                                          err_msg=f"cluster {i} {k}")

    # complete catalog: immediate return, content untouched
    ensemble_datagen(M, c, cut_fn, resume=True, **kw)

    # config mismatch refuses to splice (an incomplete file — complete
    # catalogs return before validation)
    with h5py.File(cut_fn, "a") as f:
        del f.attrs["complete"]
    bad = dict(kw, key=jax.random.key(99))
    with pytest.raises(ValueError, match="key_data"):
        ensemble_datagen(M, c, cut_fn, resume=True, **bad)
    bad = dict(kw, batch_size=3)
    with pytest.raises(ValueError, match="batch_size"):
        ensemble_datagen(M, c, cut_fn, resume=True, **bad)

    # a catalog written under an older draw-semantics version (or from
    # before versioning existed) must refuse to splice: the recomputed
    # batches would carry DIFFERENT physics than the kept ones
    with h5py.File(cut_fn, "a") as f:
        f.attrs["draws_version"] = 1
    with pytest.raises(ValueError, match="draws_version"):
        ensemble_datagen(M, c, cut_fn, resume=True, **kw)
    with h5py.File(cut_fn, "a") as f:
        del f.attrs["draws_version"]  # pre-versioning file
    with pytest.raises(ValueError, match="draws_version"):
        ensemble_datagen(M, c, cut_fn, resume=True, **kw)

    with pytest.raises(ValueError, match="mutually"):
        ensemble_datagen(M, c, cut_fn, resume=True, overwrite=True, **kw)


@pytest.mark.slow
def test_catalog_batches_training_loop_form(tmp_path):
    """catalog_batches stacks clusters on a leading batch axis (datasets
    AND attrs), shuffles deterministically by key, drops/keeps the
    remainder as asked, and matches read_catalog's contents exactly —
    with and without the prefetch thread."""
    from cluster_generator_tpu.parallel import (
        catalog_batches,
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(9), 7)
    fn = str(tmp_path / "cat.h5")
    ensemble_datagen(M, c, fn, {"dm": 400, "gas": 300, "star": 100},
                     batch_size=4, num_points=128)
    singles = dict(read_catalog(fn))

    # catalog order, drop_remainder: 7 clusters -> 2 batches of 3
    got = list(catalog_batches(fn, 3))
    assert len(got) == 2
    assert got[0]["dm_position"].shape == (3, 400, 3)
    assert got[0]["gas_thermal_energy"].shape == (3, 300)
    assert got[0]["M200"].shape == (3,)
    np.testing.assert_array_equal(got[0]["star_velocity"][1],
                                  singles[1]["star_velocity"])
    np.testing.assert_array_equal(got[1]["particle_mass_gas"],
                                  [singles[i]["particle_mass_gas"]
                                   for i in (3, 4, 5)])

    # keep the remainder -> a final short batch
    tails = list(catalog_batches(fn, 3, drop_remainder=False))
    assert [b["M200"].shape[0] for b in tails] == [3, 3, 1]
    np.testing.assert_array_equal(tails[2]["dm_velocity"][0],
                                  singles[6]["dm_velocity"])

    # keyed shuffle: deterministic, a permutation, key-dependent
    key = jax.random.key(3)
    perm = np.asarray(jax.random.permutation(key, 7))
    sh1 = list(catalog_batches(fn, 3, key=key))
    sh2 = list(catalog_batches(fn, 3, key=key, prefetch=False))
    for b1, b2 in zip(sh1, sh2):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
    np.testing.assert_array_equal(
        np.concatenate([b["M200"] for b in sh1]),
        [singles[i]["M200"] for i in perm[:6]])

    # field-subset reads: only the asked datasets (attrs always ride)
    sel = list(catalog_batches(fn, 3, fields=["dm_position"]))
    assert "dm_position" in sel[0] and "dm_velocity" not in sel[0]
    assert "M200" in sel[0]
    np.testing.assert_array_equal(sel[0]["dm_position"],
                                  got[0]["dm_position"])

    import pytest

    with pytest.raises(KeyError, match="not in cluster group"):
        next(read_catalog(fn, fields=["dm_positoin"]))  # typo -> loud
    with pytest.raises(ValueError, match="batch_size"):
        next(catalog_batches(fn, 0))


@pytest.mark.slow
def test_catalog_to_particles_bridge(tmp_path):
    """catalog_to_particles turns one catalog cluster into a
    ClusterParticles that exports to a Gadget file (the datagen -> IC
    bridge), for both catalog forms."""
    from cluster_generator_tpu.parallel.ensemble import (
        catalog_to_particles,
        ensemble_datagen,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(2), 3)
    full_fn = str(tmp_path / "full.h5")
    ensemble_datagen(M, c, full_fn, {"dm": 700, "gas": 500, "star": 100},
                     batch_size=3, num_points=128)
    p = catalog_to_particles(full_fn, 1)
    assert sorted(p.particle_types) == ["dm", "gas", "star"]
    assert p.num_particles == {"dm": 700, "gas": 500, "star": 100}
    assert (np.asarray(p["gas", "particle_velocity"]) == 0).all()
    assert (np.asarray(p["gas", "thermal_energy"]) > 0).all()
    assert (np.asarray(p["dm", "particle_mass"]) > 0).all()
    p.add_offsets([15000.0] * 3, [0.0] * 3)  # origin-centered -> box/2
    out = p.write_to_gadget_file(str(tmp_path / "ic.h5"), box_size=30000.0,
                                 overwrite=True)
    assert out == {"dm": 700, "gas": 500, "star": 100}  # nothing clipped

    dm_fn = str(tmp_path / "dm.h5")
    ensemble_datagen(M, c, dm_fn, 900, batch_size=3, num_points=128)
    p2 = catalog_to_particles(dm_fn, 2)
    assert p2.particle_types == ["dm"]
    assert p2.num_particles == {"dm": 900}


def test_datagen_resume_detects_unwritten_extents(tmp_path):
    """A crash inside the raw write window leaves every dataset of a
    batch PRESENT (RawWriter flushes the batch's metadata before
    pwriting its bytes) but zero-filled.  The ``_batches_done`` marker
    — updated only after the bytes land — makes resume recompute such
    batches; verify_catalog flags them in any file regardless of
    provenance; pre-marker files fall back to the presence check."""
    import h5py

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
        verify_catalog,
    )

    M, c = sample_ensemble_params(jax.random.key(4), 7)
    kw = dict(n_particles_per_cluster={"dm": 300, "gas": 200, "star": 80},
              batch_size=2, num_points=128, key=jax.random.key(11))
    ref_fn = str(tmp_path / "ref.h5")
    ensemble_datagen(M, c, ref_fn, **kw)
    ref = dict(read_catalog(ref_fn))

    fn = str(tmp_path / "crash.h5")
    ensemble_datagen(M, c, fn, **kw)
    # simulate the window for the batch at b0=2 (clusters 2 and 3):
    # datasets present, extents never written, marker not yet recorded
    with h5py.File(fn, "a") as f:
        assert sorted(f.attrs["_batches_done"]) == [0, 2, 4, 6]
        del f.attrs["complete"]
        f.attrs["_batches_done"] = np.asarray(
            [b for b in f.attrs["_batches_done"] if b != 2], np.int64)
        for i in (2, 3):
            g = f[f"cluster_{i:06d}"]
            for k in g:
                g[k][...] = 0.0

    with pytest.raises(ValueError, match="zero"):
        verify_catalog(fn)

    ensemble_datagen(M, c, fn, resume=True, **kw)
    got = dict(read_catalog(fn))
    assert sorted(got) == sorted(ref)
    for i in ref:
        for k in ref[i]:
            np.testing.assert_array_equal(got[i][k], ref[i][k],
                                          err_msg=f"cluster {i} {k}")
    assert verify_catalog(fn)["violations"] == []

    # pre-marker files (no _batches_done attr) fall back to the
    # dataset-presence check
    with h5py.File(fn, "a") as f:
        del f.attrs["complete"]
        del f.attrs["_batches_done"]
        del f["cluster_000004"]
    ensemble_datagen(M, c, fn, resume=True, **kw)
    got = dict(read_catalog(fn))
    np.testing.assert_array_equal(got[4]["dm_position"],
                                  ref[4]["dm_position"])


def test_multihost_shard_resume_requires_matching_rank(tmp_path):
    """Resuming a multihost shard through a plain ensemble_datagen call
    (or the wrong rank) refuses — it would silently compute every other
    rank's batches into this shard."""
    import h5py

    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        ensemble_datagen_multihost,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(2), 6)
    kw = dict(n_particles_per_cluster=400, batch_size=2, num_points=128,
              key=jax.random.key(1))
    shard = ensemble_datagen_multihost(M, c, str(tmp_path / "s.h5"),
                                       rank=1, nproc=3, **kw)
    with h5py.File(shard, "a") as f:
        del f.attrs["complete"]
    with pytest.raises(ValueError, match="shard_rank"):
        ensemble_datagen(M, c, shard, resume=True, **kw)
    # (a WRONG rank through the multihost API lands on a different
    # filename — the rank is embedded in the shard name — so the only
    # collision path is the plain-call one above)
    # the matching rank resumes fine
    ensemble_datagen_multihost(M, c, str(tmp_path / "s.h5"),
                               rank=1, nproc=3, resume=True, **kw)


def test_catalog_consumers_accept_one_shot_iterables(tmp_path):
    """catalog_batches / verify_catalog normalize the filename-sequence
    argument ONCE — a generator (e.g. glob.iglob over shards) must not
    be silently exhausted by a metadata peek."""
    from cluster_generator_tpu.parallel import (
        catalog_batches,
        ensemble_datagen,
        sample_ensemble_params,
        verify_catalog,
    )

    M, c = sample_ensemble_params(jax.random.key(8), 5)
    fn = str(tmp_path / "c.h5")
    ensemble_datagen(M, c, fn, 400, batch_size=2, num_points=128,
                     key=jax.random.key(1))
    n = sum(b["M200"].shape[0]
            for b in catalog_batches(iter([fn]), 2, drop_remainder=False))
    assert n == 5
    assert verify_catalog(iter([fn]))["violations"] == []
