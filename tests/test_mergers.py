"""Merger-scene ensemble datagen (parallel/mergers.py): batched binary
merger ICs streamed to a catalog.  The reference builds ONE merger scene
per `ClusterICs.setup_particle_ics` call (ics.py:323-375); this product
vmaps the fused merger pipeline over a scene-parameter ensemble, sharing
the catalog machinery (resume, raw writes, multihost shards) with
ensemble_datagen — these tests pin the merger-specific surface."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cluster_generator_tpu.parallel import (
    binary_scene_geometry,
    merger_datagen,
    merger_datagen_multihost,
    read_merger_catalog,
    sample_merger_scene_params,
)

COUNTS = {"gas": 48, "dm": 64, "star": 16}
# prorate=False: these tests pin exact per-halo segment layouts, so they
# use the explicit even split; proration has its own test below
KW = dict(counts=COUNTS, batch_size=2, num_points=128,
          r_max=3000.0, key=jax.random.key(5), prorate=False)


def _params(n=5, key=0):
    return sample_merger_scene_params(jax.random.key(key), n)


def test_scene_params_shapes_and_bounds():
    p = _params(64, key=3)
    assert p["M200"].shape == (64, 2) and p["conc"].shape == (64, 2)
    M = np.asarray(p["M200"])
    assert np.all(M[:, 1] <= M[:, 0])          # ratio <= 1: halo 0 primary
    assert np.all(M > 0)
    c = np.asarray(p["conc"])
    assert np.all((c >= 3.0) & (c <= 8.0))
    d, b = np.asarray(p["d"]), np.asarray(p["b"])
    assert np.all((d >= 2000.0) & (d <= 4000.0))
    assert np.all((b >= 0.0) & (b <= 0.5 * d))
    v = np.asarray(p["v_rel"])
    assert np.all((v >= 0.5) & (v <= 1.5))


def test_binary_scene_geometry_separation_and_momentum():
    M200 = np.array([[1.0e15, 2.5e14], [8.0e14, 8.0e14]])
    d = np.array([3000.0, 2500.0])
    b = np.array([500.0, 0.0])
    v_rel = np.array([1.0, 0.8])
    ctr, vel = binary_scene_geometry(M200, d, b, v_rel,
                                     center=(7.0, -3.0, 2.0))
    assert ctr.shape == (2, 2, 3) and vel.shape == (2, 2, 3)
    # total separation is exactly d (the reference composes sqrt(d^2-b^2)
    # along the axis + b transverse, ics.py:22-57)
    np.testing.assert_allclose(
        np.linalg.norm(ctr[:, 1] - ctr[:, 0], axis=1), d, rtol=1e-14)
    # midpoint is the requested scene center
    np.testing.assert_allclose(0.5 * (ctr[:, 0] + ctr[:, 1]),
                               np.broadcast_to([7.0, -3.0, 2.0], (2, 3)))
    # zero-momentum frame, relative speed v_rel along x
    mom = (M200[..., None] * vel).sum(axis=1)
    np.testing.assert_allclose(mom, 0.0, atol=1e-9 * M200.max())
    np.testing.assert_allclose(vel[:, 0, 0] - vel[:, 1, 0], v_rel)
    assert np.all(vel[..., 1:] == 0.0)
    with pytest.raises(ValueError, match="exceeds separation"):
        binary_scene_geometry(M200, d, np.array([3500.0, 0.0]), v_rel)


@pytest.mark.slow
def test_merger_datagen_end_to_end(tmp_path):
    """Write a small merger catalog; every scene carries the full
    multi-species product with per-halo segment attribution, physical
    gas energies, and bounded geometry."""
    p = _params(5)
    fn = str(tmp_path / "mergers.h5")
    out = merger_datagen(p, fn, **KW)
    assert out == fn

    with h5py.File(fn, "r") as f:
        assert bool(f.attrs["complete"])
        assert f.attrs["product"] == "merger_scenes"
        assert int(f.attrs["n_clusters"]) == 5
        assert int(f.attrs["n_halos"]) == 2
        np.testing.assert_array_equal(f.attrs["n_gas_per_halo"], [24, 24])
        np.testing.assert_array_equal(f.attrs["n_dm_per_halo"], [32, 32])
        np.testing.assert_array_equal(f.attrs["n_star_per_halo"], [8, 8])

    scenes = dict(read_merger_catalog(fn))
    assert sorted(scenes) == list(range(5))
    ctr_all, vel_all = binary_scene_geometry(p["M200"], p["d"], p["b"],
                                             p["v_rel"])
    for i, sc in scenes.items():
        assert sc["gas_position"].shape == (48, 3)
        assert sc["gas_velocity"].shape == (48, 3)
        assert sc["gas_thermal_energy"].shape == (48,)
        assert sc["gas_density"].shape == (48,)
        assert sc["dm_position"].shape == (64, 3)
        assert sc["star_velocity"].shape == (16, 3)
        np.testing.assert_allclose(sc["M200"], np.asarray(p["M200"])[i])
        np.testing.assert_allclose(sc["center"], ctr_all[i])
        np.testing.assert_allclose(sc["bulk_velocity"], vel_all[i])
        assert np.all(sc["gas_thermal_energy"] > 0)
        assert np.all(sc["gas_density"] > 0)
        for sp in ("gas", "dm", "star"):
            pm = sc[f"particle_mass_{sp}"]
            assert pm.shape == (2,) and np.all(pm > 0)
        # halo attribution by contiguous segments: each DM halo's
        # particles lie within r_max of ITS center, and the segment
        # center-of-mass sits much nearer its own halo than the other
        pos = sc["dm_position"]
        for h, seg in ((0, slice(0, 32)), (1, slice(32, 64))):
            r = np.linalg.norm(pos[seg] - sc["center"][h], axis=1)
            assert np.all(r <= 3000.0 * (1 + 1e-5))
            com = pos[seg].mean(axis=0)
            d_own = np.linalg.norm(com - sc["center"][h])
            d_other = np.linalg.norm(com - sc["center"][1 - h])
            assert d_own < d_other
        # collisionless velocities inherit the halo bulk motion: the
        # segment-mean peculiar velocity is small vs the bulk split
        vmean = sc["dm_velocity"][:32].mean(axis=0)
        assert abs(vmean[0] - sc["bulk_velocity"][0, 0]) < 0.5

    # fields= subsetting (attrs always included); unknown names raise
    (_, sub), = read_merger_catalog(fn, indices=[2],
                                    fields=["dm_position"])
    assert "dm_position" in sub and "gas_position" not in sub
    assert "M200" in sub
    with pytest.raises(KeyError, match="nope"):
        next(read_merger_catalog(fn, indices=[0], fields=["nope"]))

    # overwrite refusal names the resume escape hatch
    with pytest.raises(IOError, match="resume=True"):
        merger_datagen(p, fn, **KW)


def test_merger_draws_match_direct_pipeline(tmp_path):
    """Catalog scenes are draw-identical to calling the fused merger
    pipeline directly with the documented key schedule (batch key =
    fold_in(key, b0); scene key = fold_in(batch key, local index))."""
    from cluster_generator_tpu.pipeline import merger_ic_fused

    p = _params(3, key=9)
    fn = str(tmp_path / "direct.h5")
    merger_datagen(p, fn, **KW)
    scenes = dict(read_merger_catalog(fn))
    ctr, vel = binary_scene_geometry(p["M200"], p["d"], p["b"], p["v_rel"])
    b0, i = 2, 0   # scene 2 = batch at offset 2 (batch_size=2), local 0
    k = jax.random.fold_in(jax.random.fold_in(KW["key"], b0), i)
    parts, _ = merger_ic_fused(
        jnp.asarray(p["M200"])[b0 + i], jnp.asarray(p["conc"])[b0 + i],
        jnp.asarray(ctr[b0 + i]), jnp.asarray(vel[b0 + i]),
        jnp.full((2,), 3000.0), k, (24, 24), (32, 32), (8, 8),
        num_points=128)
    np.testing.assert_array_equal(scenes[2]["dm_position"],
                                  np.asarray(parts["dm", "particle_position"]))
    np.testing.assert_array_equal(scenes[2]["gas_thermal_energy"],
                                  np.asarray(parts["gas", "thermal_energy"]))
    np.testing.assert_array_equal(
        scenes[2]["particle_mass_star"],
        np.asarray([parts["star", "particle_mass"][0],
                    parts["star", "particle_mass"][8]]))


def test_merger_datagen_resume_is_bit_identical(tmp_path):
    """The shared streaming loop's resume semantics hold for the merger
    product, plus the merger-specific guard: resuming against a
    DIFFERENT scene ensemble (params_sha) refuses to splice."""
    p = _params(5, key=21)
    ref_fn = str(tmp_path / "ref.h5")
    merger_datagen(p, ref_fn, **KW)
    ref = dict(read_merger_catalog(ref_fn))

    cut_fn = str(tmp_path / "cut.h5")
    merger_datagen(p, cut_fn, **KW)
    with h5py.File(cut_fn, "a") as f:
        del f.attrs["complete"]
        del f["scene_000004"]
        del f["scene_000002"]["dm_velocity"]  # partially-written batch
        done = [b for b in f.attrs["_batches_done"] if b not in (2, 4)]
        f.attrs["_batches_done"] = np.asarray(done, np.int64)

    merger_datagen(p, cut_fn, resume=True, **KW)
    got = dict(read_merger_catalog(cut_fn))
    assert sorted(got) == sorted(ref)
    for i in ref:
        for k in ref[i]:
            np.testing.assert_array_equal(got[i][k], ref[i][k],
                                          err_msg=f"scene {i} {k}")

    # complete catalog: immediate no-op return
    merger_datagen(p, cut_fn, resume=True, **KW)

    # wrong ensemble: params_sha mismatch refuses the splice
    with h5py.File(cut_fn, "a") as f:
        del f.attrs["complete"]
    p_other = _params(5, key=22)
    with pytest.raises(ValueError, match="params_sha"):
        merger_datagen(p_other, cut_fn, resume=True, **KW)
    with pytest.raises(ValueError, match="mutually"):
        merger_datagen(p, cut_fn, resume=True, overwrite=True, **KW)


def test_merger_multihost_shards_reassemble(tmp_path):
    """Rank shards union to the plain run bit-identically (keys fold on
    the GLOBAL batch offset; no coordinator)."""
    p = _params(5, key=13)
    plain_fn = str(tmp_path / "plain.h5")
    merger_datagen(p, plain_fn, **KW)
    plain = dict(read_merger_catalog(plain_fn))

    shards = [merger_datagen_multihost(p, str(tmp_path / "sh.h5"),
                                       rank=r, nproc=2, **KW)
              for r in range(2)]
    assert shards[0].endswith("sh.0of2.h5")
    got = dict(read_merger_catalog(shards))
    assert sorted(got) == sorted(plain)
    for i in plain:
        for k in plain[i]:
            np.testing.assert_array_equal(got[i][k], plain[i][k],
                                          err_msg=f"scene {i} {k}")
    with pytest.raises(ValueError, match="rank"):
        merger_datagen_multihost(p, str(tmp_path / "x.h5"), rank=2,
                                 nproc=2, **KW)


def test_merger_datagen_input_validation(tmp_path):
    p = _params(3)
    fn = str(tmp_path / "v.h5")
    with pytest.raises(ValueError, match="unknown species"):
        merger_datagen(p, fn, counts={"darkmatter": 10})
    with pytest.raises(ValueError, match="2 entries for 2 halos|has 3"):
        merger_datagen(p, fn, counts={"dm": (10, 10, 10)})
    with pytest.raises(ValueError, match="all species counts are zero"):
        merger_datagen(p, fn, counts={"dm": 0})
    bad = dict(p, M200=np.asarray(p["M200"])[:, 0])
    with pytest.raises(ValueError, match="n_scenes, n_halos"):
        merger_datagen(bad, fn, counts=COUNTS)
    three = {"M200": np.full((2, 3), 1e14), "conc": np.full((2, 3), 5.0),
             "d": np.full(2, 3000.0), "b": np.zeros(2),
             "v_rel": np.ones(2)}
    with pytest.raises(ValueError, match="binary-only"):
        merger_datagen(three, fn, counts=COUNTS)


def test_merger_uneven_and_zero_count_halos(tmp_path):
    """Odd totals split with the remainder on the first halos; a
    zero-count species-halo contributes nothing and its mass attr is 0."""
    p = _params(2, key=7)
    fn = str(tmp_path / "odd.h5")
    merger_datagen(p, fn, counts={"dm": 31, "gas": (20, 0)},
                   batch_size=2, num_points=128, key=jax.random.key(1),
                   prorate=False)
    with h5py.File(fn, "r") as f:
        np.testing.assert_array_equal(f.attrs["n_dm_per_halo"], [16, 15])
        np.testing.assert_array_equal(f.attrs["n_gas_per_halo"], [20, 0])
        np.testing.assert_array_equal(f.attrs["n_star_per_halo"], [0, 0])
    (_, sc), = read_merger_catalog(fn, indices=[1])
    assert sc["dm_position"].shape == (31, 3)
    assert sc["gas_position"].shape == (20, 3)
    assert "star_position" not in sc
    pm = sc["particle_mass_gas"]
    assert pm[0] > 0 and pm[1] == 0.0


@pytest.mark.slow
def test_verify_merger_catalog(tmp_path, capsys):
    """The physics QA gate on merger catalogs: clean catalogs pass,
    corrupted gas energies / escaped velocities fire named violations,
    and verify_catalog (and the CLI verify subcommand) dispatch on the
    product attr."""
    from cluster_generator_tpu.cli import main
    from cluster_generator_tpu.parallel import (
        verify_catalog,
        verify_merger_catalog,
    )

    p = _params(3, key=5)
    fn = str(tmp_path / "qa.h5")
    merger_datagen(p, fn, counts={"gas": 4000, "dm": 6000, "star": 1000},
                   batch_size=2, num_points=128, key=jax.random.key(4))

    report = verify_merger_catalog(fn)
    assert report["violations"] == []
    assert report["n_scenes_checked"] == 3
    assert report["max_speed_frac"] <= 1.0 + 5e-3
    assert report["max_energy_rel_err"] <= 1e-3
    assert report["max_mass_rel_err"] <= 1e-4
    # dispatch: the generic entry point hands merger catalogs over
    via_dispatch = verify_catalog(fn)
    assert via_dispatch["n_scenes_checked"] == 3
    assert main(["verify", fn]) == 0
    capsys.readouterr()

    # corrupt the mixed gas energies -> named violation, exit 1
    with h5py.File(fn, "a") as f:
        d = f["scene_000001/gas_thermal_energy"]
        d[...] = np.asarray(d[()]) * 2.0
    bad = verify_merger_catalog(fn, strict=False)
    assert any("mixed thermal energy" in v for v in bad["violations"])
    assert main(["verify", fn]) == 1
    capsys.readouterr()

    # unbind one DM particle (peculiar speed past v_esc) -> violation
    with h5py.File(fn, "a") as f:
        d = f["scene_000002/dm_velocity"]
        v = np.asarray(d[()])
        v[0] = [50.0, 0.0, 0.0]  # ~5e4 km/s: far beyond any v_esc
        d[...] = v
    bad = verify_merger_catalog(fn, indices=[2], strict=False)
    assert any("peculiar speed" in v for v in bad["violations"])

    # zero-fill one scene's star velocities (the crash mode where a
    # batch's velocity extents were never written while positions were)
    # -> the all-zero gate must fire on the RAW stored values
    with h5py.File(fn, "a") as f:
        f["scene_000000/star_velocity"][...] = 0.0
    bad = verify_merger_catalog(fn, indices=[0], strict=False)
    assert any("all-zero stored velocities" in v for v in bad["violations"])

    # strict=True raises with the violation text
    with pytest.raises(ValueError, match="physics QA"):
        verify_merger_catalog(fn)

    # non-merger catalogs are rejected by the merger verifier
    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(1), 2)
    cl = str(tmp_path / "plain.h5")
    ensemble_datagen(M, c, cl, 2000, batch_size=2, num_points=128,
                     key=jax.random.key(2))
    with pytest.raises(ValueError, match="not a merger-scene"):
        verify_merger_catalog(cl)


def test_scene_to_particles_bridge(tmp_path):
    """Merger catalog -> ClusterParticles -> Gadget export: the scene
    bridge expands per-halo masses over the static segments, keeps the
    mixed gas fields, and catalog_to_particles dispatches on the
    product attr."""
    from cluster_generator_tpu.parallel import (
        catalog_to_particles,
        scene_to_particles,
    )
    from cluster_generator_tpu.particles import ClusterParticles

    p = _params(2, key=8)
    fn = str(tmp_path / "bridge.h5")
    merger_datagen(p, fn, **KW)

    parts = scene_to_particles(fn, 1)
    assert parts.num_particles == {"gas": 48, "dm": 64, "star": 16}
    # per-halo masses expand over the contiguous segments
    sc = dict(read_merger_catalog(fn, indices=[1]))[1]
    pm = np.asarray(parts["dm", "particle_mass"])
    np.testing.assert_allclose(pm[:32], sc["particle_mass_dm"][0])
    np.testing.assert_allclose(pm[32:], sc["particle_mass_dm"][1])
    assert np.asarray(parts["gas", "thermal_energy"]).min() > 0
    assert ("gas", "density") in parts.fields
    # gas keeps the density-weighted mixed velocity (nonzero bulk)
    assert np.abs(np.asarray(parts["gas", "particle_velocity"])).max() > 0

    # the generic bridge dispatches to the scene form
    parts2 = catalog_to_particles(fn, 1)
    np.testing.assert_array_equal(
        np.asarray(parts2["dm", "particle_position"]),
        np.asarray(parts["dm", "particle_position"]))

    # and the result feeds the exporter stack
    box = 20000.0
    parts.add_offsets([box / 2.0] * 3, [0.0] * 3)
    gf = str(tmp_path / "scene_gadget.h5")
    parts.write_to_gadget_file(gf, box)
    back = ClusterParticles.from_gadget_file(gf)
    assert back.num_particles["gas"] == 48


@pytest.mark.slow
def test_halo_mass_weights_and_proration(tmp_path):
    """Int counts are split across halos by the ensemble-mean mass
    fraction by default (the static-shape form of the reference's
    pro-rata rule, ics.py:100-160): a ~4:1 ensemble gives the primary
    ~4x the particles, so both halos get comparable per-particle mass —
    the round-4 even split gave the secondary 4x the mass resolution."""
    from cluster_generator_tpu.parallel import halo_mass_weights
    from cluster_generator_tpu.parallel.mergers import _split_by_weights

    # largest-remainder rounding: exact sum, proportional parts
    assert _split_by_weights(10, [1.0, 1.0]) == (5, 5)
    assert _split_by_weights(10, [4.0, 1.0]) == (8, 2)
    assert sum(_split_by_weights(31, [3.0, 2.0, 1.0])) == 31

    M200 = np.stack([np.full(6, 2.0e15), np.full(6, 5.0e14)], axis=1)
    w = halo_mass_weights(M200)
    np.testing.assert_allclose(w, [0.8, 0.2])

    p = _params(2, key=9)
    p = dict(p, M200=jnp.asarray(M200[:2]))
    fn = str(tmp_path / "prorated.h5")
    merger_datagen(p, fn, counts={"dm": 1000, "gas": 500},
                   batch_size=2, num_points=128, key=jax.random.key(2))
    with h5py.File(fn, "r") as f:
        np.testing.assert_array_equal(f.attrs["n_dm_per_halo"], [800, 200])
        np.testing.assert_array_equal(f.attrs["n_gas_per_halo"],
                                      [400, 100])
    # per-particle masses now comparable between halos (equal-mass
    # resolution on ensemble average); even split would put the ratio
    # at ~ the mass ratio (4x)
    (_, sc), = read_merger_catalog(fn, indices=[0])
    pm = sc["particle_mass_dm"]
    assert 0.5 < pm[1] / pm[0] < 2.0


@pytest.mark.slow
def test_triple_scene_geometry_and_datagen(tmp_path):
    """3-halo scenes: the geometry helper's invariants (exact pair
    separation, third-halo distance from the pair's center of mass,
    zero total momentum) and a small H=3 catalog end-to-end through the
    physics QA gate (gas mixing sums over all three halos)."""
    from cluster_generator_tpu.parallel import (
        sample_triple_scene_params,
        triple_scene_geometry,
        verify_merger_catalog,
    )

    M200 = np.array([[1.5e15, 7.0e14, 3.0e14],
                     [8.0e14, 6.0e14, 2.0e14]])
    d12 = np.array([3000.0, 2500.0])
    b12 = np.array([500.0, 0.0])
    v12 = np.array([1.0, 0.8])
    d3 = np.array([4000.0, 3500.0])
    b3 = np.array([800.0, 0.0])
    v3 = np.array([0.5, 0.7])
    ctr, vel = triple_scene_geometry(M200, d12, b12, v12, d3, b3, v3)
    assert ctr.shape == (2, 3, 3) and vel.shape == (2, 3, 3)
    # pair separation is exactly d12; third halo at d3 from the pair com
    np.testing.assert_allclose(
        np.linalg.norm(ctr[:, 1] - ctr[:, 0], axis=1), d12)
    w = M200[:, :2] / M200[:, :2].sum(axis=1, keepdims=True)
    com12 = (w[:, :, None] * ctr[:, :2]).sum(axis=1)
    np.testing.assert_allclose(
        np.linalg.norm(ctr[:, 2] - com12, axis=1), d3)
    # zero-momentum frame
    mom = (M200[:, :, None] * vel).sum(axis=1)
    np.testing.assert_allclose(mom, 0.0, atol=1e-9 * M200.max())
    with pytest.raises(ValueError, match="b3 exceeds"):
        triple_scene_geometry(M200, d12, b12, v12, d3,
                              np.array([4100.0, 0.0]), v3)

    p = sample_triple_scene_params(jax.random.key(11), 2)
    assert p["M200"].shape == (2, 3) and p["centers"].shape == (2, 3, 3)
    fn = str(tmp_path / "triple.h5")
    merger_datagen(p, fn, counts={"dm": 3000, "gas": 2400, "star": 600},
                   batch_size=2, num_points=128, key=jax.random.key(3))
    with h5py.File(fn, "r") as f:
        assert int(f.attrs["n_halos"]) == 3
    report = verify_merger_catalog(fn)
    assert report["violations"] == []
    assert report["n_scenes_checked"] == 2


@pytest.mark.slow
def test_merger_om_anisotropy(tmp_path):
    """anisotropy_radius: the merger catalog records r_a, the drawn
    velocity field is radially anisotropic per halo (the QA gate's
    beta-shell check passes), and an ISOTROPIC catalog relabeled as OM
    fails that check loudly."""
    from cluster_generator_tpu.parallel import verify_merger_catalog

    r_a = 500.0
    p = _params(2, key=13)
    kw = dict(counts={"dm": 40_000}, batch_size=2, num_points=128,
              r_max=3000.0, key=jax.random.key(6), prorate=False)
    fn = str(tmp_path / "om.h5")
    merger_datagen(p, fn, anisotropy_radius=r_a, **kw)
    with h5py.File(fn, "r") as f:
        assert float(f.attrs["r_a"]) == r_a
    report = verify_merger_catalog(fn)
    assert report["violations"] == []

    # isotropic draws relabeled as OM: the beta gate must fire
    iso = str(tmp_path / "iso.h5")
    merger_datagen(p, iso, **kw)
    with h5py.File(iso, "a") as f:
        f.attrs["r_a"] = r_a
    bad = verify_merger_catalog(iso, strict=False)
    assert any("anisotropy beta" in v for v in bad["violations"])

    # r_a=0 is rejected up front (the attr's isotropic sentinel)
    with pytest.raises(ValueError, match="anisotropy_radius"):
        merger_datagen(p, str(tmp_path / "z.h5"), anisotropy_radius=0.0,
                       **kw)


def test_qa_tolerance_table_shared():
    """Both QA gates read their defaults from the one tolerance table
    (parallel/qa.py): shared speed/zero-row knobs are IDENTICAL (one
    draw scheme, one rationale — r4 shipped 1e-4 vs 0.0), and the
    product-specific method floors come from the same table."""
    import inspect

    from cluster_generator_tpu.parallel import (
        verify_catalog,
        verify_merger_catalog,
    )
    from cluster_generator_tpu.parallel.qa import QA_TOLERANCES as T

    sc = inspect.signature(verify_catalog).parameters
    sm = inspect.signature(verify_merger_catalog).parameters
    for k in ("speed_tol", "zero_row_tol"):
        assert sc[k].default == sm[k].default == T[k]
    for k in ("energy_rtol", "radius_tol", "mass_rtol"):
        assert sc[k].default == T["cluster"][k]
        assert sm[k].default == T["merger"][k]
