"""Chunked YTHDF5 grid builder (reference data_structures.py +
tests/test_data_structures.py)."""

import numpy as np
import pytest

import cluster_generator_tpu as cg
from cluster_generator_tpu.data_structures import YTHDF5, construct_chunks


def test_construct_chunks_shape_and_tiling():
    cm = construct_chunks((128, 128, 64), 32)
    assert cm.shape == (3, 2, 4 * 4 * 2)
    assert cm.dtype == np.uint32
    # every chunk is a cube of side 32; union tiles the domain
    spans = cm[:, 1, :] - cm[:, 0, :]
    assert (spans == 32).all()
    assert cm[:, 0, :].min() == 0
    assert cm[0, 1, :].max() == 128
    assert cm[2, 1, :].max() == 64
    # no duplicate chunk origins
    origins = set(map(tuple, cm[:, 0, :].T.tolist()))
    assert len(origins) == cm.shape[-1]


def test_build_schema(tmp_path):
    import h5py

    fn = str(tmp_path / "grid.h5")
    ds = YTHDF5.build(fn, (64, 64, 64), np.array([[-1000.0, 1000.0]] * 3),
                      chunksize=32)
    assert ds.chunksize == 32
    assert (np.asarray(ds.domain_dimensions) == 64).all()
    with h5py.File(fn) as f:
        assert set(f["grid"].keys()) == set(YTHDF5._yt_fields)
        assert f["grid"]["density"].shape == (8, 32, 32, 32)
        assert f.attrs["model_count"] == 0
    with pytest.raises(IOError):
        YTHDF5.build(fn, (64, 64, 64))
    with pytest.raises(AssertionError):
        YTHDF5.build(str(tmp_path / "g2.h5"), (100, 100, 100), chunksize=64)


def test_add_model_paints_fields(canonical_model, tmp_path):
    import h5py

    fn = str(tmp_path / "grid.h5")
    rmax = 2000.0
    ds = YTHDF5.build(fn, (32, 32, 32), np.array([[-rmax, rmax]] * 3),
                      chunksize=16)
    ds.add_model(canonical_model, [0, 0, 0], [0.1, 0.0, 0.0])
    with h5py.File(fn) as f:
        assert f.attrs["model_count"] == 1
        dens = np.asarray(f["grid"]["density"][()])
        mom_x = np.asarray(f["grid"]["momentum_density_x"][()])
        magp = np.asarray(f["grid"]["magnetic_pressure"][()])
    assert (dens > 0).all()
    # momentum = rho * v_bulk (data_structures.py:338-347)
    assert np.allclose(mom_x, dens * 0.1, rtol=1e-12)
    assert (magp > 0).all()

    # verify one chunk's values against direct spline evaluation
    cm = ds.chunkmap
    c = 3
    cs = ds.chunksize
    dx = 2 * rmax / 32
    start = cm[:, 0, c]
    idx = np.arange(cs)
    x = -rmax + (start[0] + idx + 0.5) * dx
    y = -rmax + (start[1] + idx + 0.5) * dx
    z = -rmax + (start[2] + idx + 0.5) * dx
    rr = np.sqrt(x[:, None, None] ** 2 + y[None, :, None] ** 2
                 + z[None, None, :] ** 2)
    from scipy.interpolate import CubicSpline

    sp = CubicSpline(np.asarray(canonical_model["radius"]),
                     np.asarray(canonical_model["density"]),
                     bc_type="not-a-knot")
    ref = sp(rr)
    # on-disk rows are z-first: dens[c][k, j, i] = f(x_i, y_j, z_k)
    assert np.allclose(dens[c], ref.transpose(2, 1, 0), rtol=1e-8)


def test_create_dataset_end_to_end(canonical_model, tmp_path):
    fn = canonical_model.create_dataset(str(tmp_path / "ds.h5"),
                                        domain_dimensions=(32, 32, 32),
                                        chunksize=16)
    ds = YTHDF5.load(fn)
    assert ds.model_count == 1
    ds.survey_memory()  # smoke


def test_add_ics(canonical_model, tmp_path):
    prof = str(tmp_path / "p.h5")
    canonical_model.write_model_to_h5(prof)
    ics = cg.ClusterICs("ds", 2, [prof, prof],
                        [[-1000, 0, 0], [1000, 0, 0]],
                        [[0.1, 0, 0], [-0.1, 0, 0]],
                        num_particles={"dm": 100}, r_max=3000.0)
    fn = str(tmp_path / "ics_grid.h5")
    ds = YTHDF5.build(fn, (32, 32, 32), np.array([[-4000.0, 4000.0]] * 3),
                      chunksize=16)
    ds.add_ICs(ics)
    assert ds.model_count == 2


def test_native_engine_matches_device(canonical_model, tmp_path):
    """C++ painter produces the same grid as the device path."""
    from cluster_generator_tpu.ops import native

    if not native.available():
        pytest.skip("native library not built")
    import h5py

    f1 = str(tmp_path / "dev.h5")
    f2 = str(tmp_path / "nat.h5")
    bbox = np.array([[-2000.0, 2000.0]] * 3)
    ds1 = YTHDF5.build(f1, (32, 32, 32), bbox, chunksize=16)
    ds1.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0], engine="device")
    ds2 = YTHDF5.build(f2, (32, 32, 32), bbox, chunksize=16)
    ds2.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0], engine="native")
    with h5py.File(f1) as a, h5py.File(f2) as b:
        for field in a["grid"]:
            va = np.asarray(a["grid"][field][()])
            vb = np.asarray(b["grid"][field][()])
            assert np.allclose(va, vb, rtol=1e-12, atol=1e-30), field


def test_noncubic_domain_orientation(canonical_model, tmp_path):
    """Painting on a NON-cubic domain with unequal per-axis extents: the
    z-first chunk rows must place f(x_i, y_j, z_k) at block[k, j, i] with
    each axis using ITS OWN delta — an axis mixup that cubic symmetric
    grids can hide shows up immediately here."""
    import h5py

    fn = str(tmp_path / "nc.h5")
    dd = (64, 32, 32)
    bbox = np.array([[-3000.0, 3000.0], [-1000.0, 1000.0],
                     [0.0, 1500.0]])
    ds = YTHDF5.build(fn, dd, bbox, chunksize=16)
    ds.add_model(canonical_model, [0, 0, 0], [0.0, 0.0, 0.0])
    with h5py.File(fn) as f:
        dens = np.asarray(f["grid"]["density"][()])
        cm = f["chunks"]["chunkmap"][:]

    from scipy.interpolate import CubicSpline

    sp = CubicSpline(np.asarray(canonical_model["radius"]),
                     np.asarray(canonical_model["density"]),
                     bc_type="not-a-knot")
    deltas = (bbox[:, 1] - bbox[:, 0]) / np.asarray(dd)
    cs = 16
    idx = np.arange(cs)
    for c in (0, 5, cm.shape[-1] - 1):
        s = cm[:, 0, c]
        x = bbox[0, 0] + (s[0] + idx + 0.5) * deltas[0]
        y = bbox[1, 0] + (s[1] + idx + 0.5) * deltas[1]
        z = bbox[2, 0] + (s[2] + idx + 0.5) * deltas[2]
        rr = np.sqrt(z[:, None, None]**2 + y[None, :, None]**2
                     + x[None, None, :]**2)
        assert np.allclose(dens[c], sp(rr), rtol=1e-8), c


def test_noncubic_native_matches_device(canonical_model, tmp_path):
    """C++ painter agrees with the device painter on the non-cubic,
    anisotropic-delta domain too."""
    from cluster_generator_tpu.ops import native

    if not native.available():
        pytest.skip("native library not built")
    import h5py

    dd = (32, 64, 32)
    bbox = np.array([[-1000.0, 1000.0], [-3000.0, 3000.0],
                     [-500.0, 2500.0]])
    files = {}
    for eng in ("device", "native"):
        fn = str(tmp_path / f"{eng}.h5")
        ds = YTHDF5.build(fn, dd, bbox, chunksize=16)
        ds.add_model(canonical_model, [100.0, -200.0, 300.0],
                     [0.1, 0.0, 0.0], engine=eng)
        files[eng] = fn
    with h5py.File(files["device"]) as fd, h5py.File(files["native"]) as fn_:
        for field in ("density", "momentum_density_x", "pressure"):
            np.testing.assert_allclose(fd["grid"][field][()],
                                       fn_["grid"][field][()], rtol=1e-12,
                                       err_msg=field)


def test_raw_slab_io_matches_h5py_path(canonical_model, tmp_path,
                                       monkeypatch):
    """The pwrite-at-offset fast path produces byte-identical files to
    the h5py H5Dwrite fallback, including the accumulate (second model)
    read-modify-write."""
    import h5py

    from cluster_generator_tpu import data_structures as DS

    bbox = np.array([[-2000.0, 2000.0]] * 3)

    def build_and_add(fn):
        ds = YTHDF5.build(fn, (32, 32, 32), bbox, chunksize=16)
        ds.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0])
        ds.add_model(canonical_model, [300.0, 0, 0], [-0.2, 0, 0])
        return ds

    f_raw = str(tmp_path / "raw.h5")
    build_and_add(f_raw)

    # force the fallback by making every _RawSlabIO ineligible
    orig_init = DS._RawSlabIO.__init__

    def no_raw(self, fileio, dset):
        orig_init(self, fileio, dset)
        self.close()
        self.eligible = False

    monkeypatch.setattr(DS._RawSlabIO, "__init__", no_raw)
    f_h5 = str(tmp_path / "h5.h5")
    build_and_add(f_h5)

    with h5py.File(f_raw) as a, h5py.File(f_h5) as b:
        for field in a["grid"]:
            np.testing.assert_array_equal(a["grid"][field][()],
                                          b["grid"][field][()],
                                          err_msg=field)


def test_f4_dtype_option(canonical_model, tmp_path):
    """dtype='f4' stores float32 datasets (half the disk traffic) whose
    values match the f8 grid at float32 precision."""
    import h5py

    bbox = np.array([[-2000.0, 2000.0]] * 3)
    f8 = str(tmp_path / "f8.h5")
    f4 = str(tmp_path / "f4.h5")
    ds8 = YTHDF5.build(f8, (32, 32, 32), bbox, chunksize=16)
    ds8.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0])
    ds4 = YTHDF5.build(f4, (32, 32, 32), bbox, chunksize=16, dtype="f4")
    ds4.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0])
    assert ds4._itemsize == 4 and ds8._itemsize == 8
    assert ds4._estimated_size == ds8._estimated_size / 2
    with h5py.File(f8) as a, h5py.File(f4) as b:
        for field in a["grid"]:
            assert b["grid"][field].dtype == np.dtype("<f4"), field
            va = a["grid"][field][()]
            vb = b["grid"][field][()].astype(np.float64)
            np.testing.assert_allclose(vb, va, rtol=2e-7, atol=0,
                                       err_msg=field)
    with pytest.raises(ValueError):
        YTHDF5.build(str(tmp_path / "bad.h5"), (32, 32, 32), bbox,
                     chunksize=16, dtype="f2")


def test_two_model_grid_is_sum_of_singles(canonical_model, tmp_path):
    """Accumulating two models onto one grid equals the sum of the two
    single-model grids (momentum fields carry their own bulk velocity
    through the scaled-copy write path), on both engines."""
    import h5py

    from cluster_generator_tpu.ops import native

    bbox = np.array([[-2000.0, 2000.0]] * 3)
    engines = ["device"] + (["native"] if native.available() else [])
    for eng in engines:
        names = {}
        for tag, adds in {
            "both": [([0, 0, 0], [0.1, 0, 0]), ([300.0, 0, 0],
                                                [0, -0.2, 0])],
            "a": [([0, 0, 0], [0.1, 0, 0])],
            "b": [([300.0, 0, 0], [0, -0.2, 0])],
        }.items():
            fn = str(tmp_path / f"{eng}_{tag}.h5")
            ds = YTHDF5.build(fn, (32, 32, 32), bbox, chunksize=16)
            for ctr, vel in adds:
                ds.add_model(canonical_model, ctr, vel, engine=eng)
            names[tag] = fn
        with h5py.File(names["both"]) as fb, \
                h5py.File(names["a"]) as fa, h5py.File(names["b"]) as fc:
            for field in fb["grid"]:
                np.testing.assert_allclose(
                    fb["grid"][field][()],
                    fa["grid"][field][()] + fc["grid"][field][()],
                    rtol=1e-12, atol=1e-300, err_msg=f"{eng}/{field}")


def test_add_model_resume_repaints_unfinished_fields(canonical_model,
                                                     tmp_path):
    """add_model(resume=True) on an interrupted FIRST paint skips the
    fields recorded complete and repaints the rest whole — final grid
    identical to an uninterrupted build.  Resume on an accumulated grid
    (model_count > 0) refuses."""
    import h5py

    bbox = np.array([[-2000.0, 2000.0]] * 3)
    ref_fn = str(tmp_path / "ref.h5")
    ds = YTHDF5.build(ref_fn, (32, 32, 32), bbox, chunksize=16)
    ds.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0])

    cut_fn = str(tmp_path / "cut.h5")
    ds2 = YTHDF5.build(cut_fn, (32, 32, 32), bbox, chunksize=16)
    ds2.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0])
    # simulate a crash mid-build: pretend only density (+ its scaled
    # momentum copies) finished; garbage the "unfinished" datasets and
    # roll back the completion markers
    with h5py.File(cut_fn, "a") as f:
        keep = {"density", "momentum_density_x", "momentum_density_y",
                "momentum_density_z"}
        f.attrs["_fields_done"] = sorted(keep)
        f.attrs["model_count"] = 0
        for field in f["grid"]:
            if field not in keep:
                f["grid"][field][...] = np.nan

    # resume with a different configuration must refuse — the completed
    # momentum fields were scaled by the OLD bulk velocity
    with pytest.raises(ValueError, match="different"):
        YTHDF5.load(cut_fn).add_model(canonical_model, [0, 0, 0],
                                      [0.2, 0, 0], resume=True)

    ds2 = YTHDF5.load(cut_fn)
    ds2.add_model(canonical_model, [0, 0, 0], [0.1, 0, 0], resume=True)
    with h5py.File(ref_fn) as a, h5py.File(cut_fn) as b:
        assert int(b.attrs["model_count"]) == 1
        for field in a["grid"]:
            np.testing.assert_array_equal(a["grid"][field][()],
                                          b["grid"][field][()],
                                          err_msg=field)

    # second model accumulates -> resume must refuse
    with pytest.raises(ValueError, match="FIRST model"):
        ds2.add_model(canonical_model, [0, 0, 0], [0.0, 0, 0],
                      resume=True)
