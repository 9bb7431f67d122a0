"""Cross-package I/O compatibility: the UPSTREAM package reads files this
framework writes.

Parity tests elsewhere compare VALUES (tests/test_reference_parity.py);
these prove the FORMATS interoperate — a reference-side consumer can pick
up our model HDF5, Gadget snapshots, and ICs YAML param files directly.
The upstream package runs via tests/refshim (see its docstring).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.refshim import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def model_file(canonical_model, tmp_path_factory):
    fn = str(tmp_path_factory.mktemp("crossio") / "model.h5")
    canonical_model.write_model_to_h5(fn)
    return fn


def test_reference_reads_our_model_h5(ref, canonical_model, model_file):
    """Upstream ClusterModel.from_h5_file loads our model HDF5 with every
    field numerically intact (schema parity, model.py:149-211)."""
    rm = ref.ClusterModel.from_h5_file(model_file)
    assert rm.num_elements == canonical_model.num_elements
    for name in ("radius", "density", "total_density", "pressure",
                 "total_mass", "gravitational_potential",
                 "dark_matter_density"):
        theirs = np.asarray(rm[name])
        ours = np.asarray(canonical_model[name])
        np.testing.assert_allclose(theirs, ours, rtol=1e-12,
                                   err_msg=name)
    # upstream converts temperature to galactic base-energy units on load
    # (model.py:184-185, keV not in _keep_units); undo with ITS converter
    from unyt import unyt_quantity

    kev = float(unyt_quantity(1.0, "keV").convert_to_base("galactic"))
    np.testing.assert_allclose(np.asarray(rm["temperature"]) / kev,
                               np.asarray(canonical_model["temperature"]),
                               rtol=1e-10)


def test_reference_reads_our_gadget_file(ref, canonical_model, tmp_path):
    """Upstream ClusterParticles.from_gadget_file reads a snapshot we
    wrote: counts, positions, velocities, masses, thermal energies all
    survive the unit round-trip (particles.py:281-335 vs our writer)."""
    box = 8000.0
    parts = canonical_model.generate_dm_particles(4000, r_max=3000.0,
                                                  prng=11)
    parts = parts + canonical_model.generate_gas_particles(
        2000, r_max=3000.0, prng=12)
    parts.add_offsets([box / 2] * 3, [0.0, 0.0, 0.0])
    fn = str(tmp_path / "ic.h5")
    parts.write_to_gadget_file(fn, box)

    rp = ref.ClusterParticles.from_gadget_file(fn)
    assert rp.num_particles == {"dm": 4000, "gas": 2000}
    for ptype in ("dm", "gas"):
        np.testing.assert_allclose(
            np.asarray(rp[ptype, "particle_position"]),
            np.asarray(parts[ptype, "particle_position"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rp[ptype, "particle_mass"]),
            np.asarray(parts[ptype, "particle_mass"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rp["gas", "thermal_energy"]),
        np.asarray(parts["gas", "thermal_energy"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rp["dm", "particle_velocity"]),
        np.asarray(parts["dm", "particle_velocity"]), rtol=1e-5,
        atol=1e-8)


def test_reference_reads_our_ics_yaml(ref, model_file, tmp_path):
    """Upstream ClusterICs.from_file parses our EOL-commented YAML param
    file (via its ruamel loader) and reconstructs the scene — including
    re-reading the profile paths, which are OUR model HDF5 files."""
    import cluster_generator_tpu as cg

    c1, c2 = cg.compute_centers_for_binary([5000.0] * 3, 3000.0, 500.0)
    ics = cg.ClusterICs("crossio", 2, [model_file, model_file], [c1, c2],
                        [[0.2, 0, 0], [-0.2, 0, 0]],
                        num_particles={"dm": 1000, "gas": 500},
                        r_max=4000.0)
    fn = str(tmp_path / "ics.yaml")
    ics.to_file(fn)

    rics = ref.ClusterICs.from_file(fn)
    assert rics.basename == "crossio"
    assert rics.num_halos == 2
    np.testing.assert_allclose(np.asarray(rics.center, dtype=np.float64),
                               np.asarray([c1, c2]))
    np.testing.assert_allclose(
        np.asarray(rics.velocity, dtype=np.float64),
        [[0.2, 0, 0], [-0.2, 0, 0]])
    assert rics.tot_np["dm"] == 1000 and rics.tot_np["gas"] == 500
    assert list(rics.profiles) == [model_file, model_file]


def test_our_frontend_reads_reference_grid_file(ref, model_file,
                                                canonical_model, tmp_path):
    """The REFERENCE package's ``create_dataset`` builds a YTHDF5 grid
    (its own schema/attrs code; the absent Cython painter is
    reconstructed in refshim with the z-first row layout its yt reader
    decodes) and OUR yt frontend reads it back: attrs, hierarchy, and
    cell values against a direct spline evaluation.

    The forward direction (reference frontend reading OUR file) is
    tests/test_frontend.py::test_reference_frontend_reads_our_file;
    together they pin the on-disk format from both sides."""
    import os
    import sys

    import h5py

    rmodel = ref.ClusterModel.from_h5_file(model_file)
    fn = str(tmp_path / "ref_grid.h5")
    rmodel.create_dataset(fn, domain_dimensions=(32, 32, 32),
                          left_edge=[-2000.0] * 3, box_size=[4000.0] * 3,
                          chunksize=16)

    with h5py.File(fn, "r") as f:
        assert set(f.attrs) >= {"domain_dimensions", "bbox", "chunksize",
                                "model_count"}
        assert f["chunks"]["chunkmap"].shape[-1] == 8
        raw = f["grid"]["density"][:]

    # load under the ytshim like test_frontend does
    shim = os.path.join(os.path.dirname(__file__), "ytshim")
    saved_path = list(sys.path)
    saved_mods = {k: sys.modules.pop(k) for k in list(sys.modules)
                  if k == "yt" or k.startswith("yt.")
                  or k.startswith("cluster_generator_tpu.frontend")}
    sys.path.insert(0, shim)
    try:
        import cluster_generator_tpu.frontend as fe

        ds = fe.ClusterGeneratorDataset(fn)
        index = ds.index
        assert index.num_grids == 8
        assert ("cluster_generator", "density") in index.field_list

        from yt.geometry.selection_routines import AlwaysSelector

        grids = list(index.grids)
        size = sum(int(np.prod(g.ActiveDimensions)) for g in grids)
        out = index.io._read_fluid_selection(
            iter([type("C", (), {"objs": grids})()]), AlwaysSelector(),
            [("cluster_generator", "density")], size)

        # values: the reference painter used FITPACK splev on the model's
        # density; compare at the cell centers OUR hierarchy reports
        from scipy.interpolate import InterpolatedUnivariateSpline as IUS

        centers = np.concatenate(
            [g.icoords_centers().reshape(-1, 3) for g in grids])
        rr = np.linalg.norm(centers, axis=1)
        sp = IUS(np.asarray(canonical_model["radius"]),
                 np.asarray(canonical_model["density"]))
        vals = out["cluster_generator", "density"]
        assert np.allclose(vals, sp(rr), rtol=1e-6)
        # and the raw file rows really are z-first (reader transposed)
        np.testing.assert_array_equal(
            vals.reshape(8, 16, 16, 16), raw.transpose(0, 3, 2, 1))
        ds.close()
    finally:
        sys.path[:] = saved_path
        for k in list(sys.modules):
            if k == "yt" or k.startswith("yt.") \
                    or k.startswith("cluster_generator_tpu.frontend"):
                sys.modules.pop(k)
        sys.modules.update(saved_mods)
