"""Executes the yt frontend plugin against real YTHDF5 files.

yt itself is not installable in this image, so ``tests/ytshim`` provides a
structural stand-in for the slice of yt's frontend ABI the plugin
subclasses (see its docstring).  Everything in
``cluster_generator_tpu/frontend`` runs for real here: ``_is_valid``
sniffing through ``yt.load``, parameter parsing, code units, hierarchy
construction (grid count / edges from the chunkmap), hyperslab-batched
fluid reads through grid.select, chunk-cached reads, and the derived-field
definitions.  Mirrors the reference's yt read-back test
(tests/test_data_structures.py:19-90).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

_SHIM = os.path.join(os.path.dirname(__file__), "ytshim")
_FLUID = "cluster_generator"


def _purge(mods):
    return {k: sys.modules.pop(k) for k in list(sys.modules)
            if k == "yt" or k.startswith("yt.")
            or k.startswith("cluster_generator_tpu.frontend")}


@pytest.fixture(scope="module")
def yt_frontend():
    saved_path = list(sys.path)
    saved_mods = _purge(sys.modules)
    sys.path.insert(0, _SHIM)
    try:
        import yt

        import cluster_generator_tpu.frontend as fe

        assert fe._HAS_YT, "shim yt not picked up"
        yield yt, fe
    finally:
        sys.path[:] = saved_path
        _purge(sys.modules)
        sys.modules.update(saved_mods)


@pytest.fixture(scope="module")
def grid_file(canonical_model, tmp_path_factory):
    """A 32^3 / chunksize-16 YTHDF5 dataset painted from the canonical
    model (8 chunks -> 8 grids)."""
    fn = str(tmp_path_factory.mktemp("frontend") / "grid.h5")
    canonical_model.create_dataset(fn, domain_dimensions=(32, 32, 32),
                                   chunksize=16, left_edge=[-2000.0] * 3,
                                   box_size=[4000.0] * 3)
    return fn


def test_yt_load_sniffs_and_parses(yt_frontend, grid_file):
    yt, fe = yt_frontend
    ds = yt.load(grid_file)
    assert isinstance(ds, fe.ClusterGeneratorDataset)
    assert ds._is_valid(grid_file)
    assert not ds._is_valid(grid_file + ".txt")
    assert _FLUID in ds.fluid_types
    np.testing.assert_array_equal(ds.domain_dimensions, [32, 32, 32])
    np.testing.assert_allclose(ds.domain_left_edge, [-2000.0] * 3)
    np.testing.assert_allclose(ds.domain_right_edge, [2000.0] * 3)
    assert ds.parameters["chunksize"] == 16
    assert float(ds.length_unit) == 1.0 and ds.length_unit.units == "kpc"
    assert ds.mass_unit.units == "Msun"
    ds.close()


def test_hierarchy_matches_chunkmap(yt_frontend, grid_file):
    import h5py

    yt, fe = yt_frontend
    ds = yt.load(grid_file)
    index = ds.index
    with h5py.File(grid_file, "r") as f:
        cm = f["chunks"]["chunkmap"][:]
        disk_fields = set(f["grid"].keys())
    assert index.num_grids == cm.shape[-1] == 8
    assert {fname for _, fname in index.field_list} == disk_fields
    assert all(ftype == _FLUID for ftype, _ in index.field_list)

    # grid edges = chunkmap cell indices * cell width + left edge
    dx = 4000.0 / 32
    np.testing.assert_allclose(index.grid_left_edge,
                               cm[:, 0, :].T * dx - 2000.0)
    np.testing.assert_allclose(index.grid_right_edge,
                               cm[:, 1, :].T * dx - 2000.0)
    assert (index.grid_dimensions == 16).all()
    for g in index.grids:
        np.testing.assert_allclose(g.dds, dx)
        assert g.Level == 0
    ds.close()


def test_fluid_read_roundtrip(yt_frontend, grid_file):
    """An all-selector read through the IO handler reproduces the raw
    chunk rows bit-for-bit, in grid order."""
    import h5py

    from yt.geometry.selection_routines import AlwaysSelector

    yt, fe = yt_frontend
    ds = yt.load(grid_file)
    index = ds.index
    grids = list(index.grids)
    size = sum(int(np.prod(g.ActiveDimensions)) for g in grids)
    chunk = type("Chunk", (), {"objs": grids})()
    fields = [(_FLUID, "density"), (_FLUID, "momentum_density_x")]
    out = index.io._read_fluid_selection(iter([chunk]), AlwaysSelector(),
                                         fields, size)
    with h5py.File(grid_file, "r") as f:
        raw_d = f["grid"]["density"][:]
        raw_m = f["grid"]["momentum_density_x"][:]
    np.testing.assert_array_equal(out[_FLUID, "density"], raw_d.ravel())
    np.testing.assert_array_equal(out[_FLUID, "momentum_density_x"],
                                  raw_m.ravel())

    # non-native field types are rejected
    with pytest.raises(NotImplementedError):
        index.io._read_fluid_selection(iter([chunk]), AlwaysSelector(),
                                       [("enzo", "Density")], size)
    ds.close()


def test_region_read_is_radially_consistent(yt_frontend, grid_file,
                                            canonical_model):
    """A box-selector read returns cells whose values match a direct
    spline evaluation at the selected cell centers — catches any axis
    transposition between the painter and the IO handler."""
    from scipy.interpolate import CubicSpline

    from yt.geometry.selection_routines import RegionSelector

    yt, fe = yt_frontend
    ds = yt.load(grid_file)
    index = ds.index
    grids = list(index.grids)
    sel = RegionSelector([-2000.0, -500.0, 0.0], [500.0, 2000.0, 1750.0])
    size = sum(g.count(sel) for g in grids)
    assert 0 < size < 32**3
    chunk = type("Chunk", (), {"objs": grids})()
    out = index.io._read_fluid_selection(iter([chunk]), sel,
                                         [(_FLUID, "density")], size)

    centers = np.concatenate([
        g.icoords_centers()[sel.fill_mask(g)] for g in grids])
    rr = np.linalg.norm(centers, axis=1)
    # rebuild the spline exactly as the painter does
    sp = CubicSpline(np.asarray(canonical_model["radius"]),
                     np.asarray(canonical_model["density"]),
                     bc_type="not-a-knot")
    np.testing.assert_allclose(out[_FLUID, "density"], sp(rr), rtol=1e-7)
    ds.close()


def test_chunk_cache_read(yt_frontend, grid_file):
    import h5py

    yt, fe = yt_frontend
    ds = yt.load(grid_file)
    index = ds.index
    grids = list(index.grids)[2:5]  # a consecutive run
    chunk = type("Chunk", (), {"objs": grids})()
    out = index.io._read_chunk_data(chunk, [(_FLUID, "pressure")])
    with h5py.File(grid_file, "r") as f:
        raw = f["grid"]["pressure"][:]
    for g in grids:
        np.testing.assert_array_equal(out[g.id][_FLUID, "pressure"],
                                      raw[g.id])
    ds.close()


def test_derived_fields(yt_frontend, grid_file):
    """velocity = momentum / density and the ideal-gas temperature derived
    fields evaluate correctly on raw data."""
    import h5py

    yt, fe = yt_frontend
    ds = yt.load(grid_file)
    index = ds.index  # noqa: F841 - triggers create_field_info
    fi = ds.field_info
    assert (_FLUID, "density") in fi
    assert ("gas", "velocity_x") in fi and ("gas", "temperature") in fi

    with h5py.File(grid_file, "r") as f:
        data = {
            (_FLUID, "density"): f["grid"]["density"][0],
            (_FLUID, "momentum_density_x"): f["grid"]["momentum_density_x"][0],
            (_FLUID, "pressure"): f["grid"]["pressure"][0],
        }

    class Data(dict):
        pass

    d = Data(data)
    d.ds = ds
    vx = fi[_FLUID, "velocity_x"].function(None, d)
    np.testing.assert_allclose(
        vx, data[_FLUID, "momentum_density_x"] / data[_FLUID, "density"])

    # aliases resolve through to the native field
    d[(_FLUID, "velocity_x")] = vx
    assert fi["gas", "velocity_x"].alias_of == (_FLUID, "velocity_x")
    np.testing.assert_array_equal(fi["gas", "velocity_x"].function(None, d),
                                  vx)

    # gas pressure/density aliases feed the temperature field
    d[("gas", "pressure")] = data[_FLUID, "pressure"]
    d[("gas", "density")] = data[_FLUID, "density"]
    temp = fi["gas", "temperature"].function(None, d)
    from yt.utilities.physical_constants import kboltz, mh

    expect = (data[_FLUID, "pressure"] / data[_FLUID, "density"]
              * ds.mu * mh / kboltz)
    np.testing.assert_allclose(temp, expect)
    assert (temp > 0).all()
    ds.close()
