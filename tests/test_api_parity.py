"""Automated API-parity audit against the upstream package.

Loads the actual reference ``cluster_generator`` (via tests/refshim) and
asserts that every public top-level name and every public method/attribute
of the core classes has an equivalent here — so parity claims in STATUS.md
are machine-checked rather than hand-maintained.  Intentional differences
are listed explicitly with reasons.
"""

from __future__ import annotations

import types

import pytest

from tests.refshim import load_reference

# upstream name -> our name (None = intentionally absent, reason in comment)
_TOPLEVEL_RENAMES: dict = {}

# per-class: upstream member -> our member (None = intentionally absent)
_MEMBER_RENAMES = {
    "ClusterModel": {
        # upstream classmethod alias of from_h5_file with a different name
        "from_arrays": "from_arrays",
        # internal unyt-dependent helper superseded by core.units
        "_from_scratch": None,
        "no_gas": "no_gas",
    },
    "ClusterParticles": {
        # upstream exposes the unyt requirement; ours keeps plain arrays
        "make_radial_cut": "make_radial_cut",
    },
    "ClusterICs": {},
    "RadialProfile": {
        # functools.partial plumbing of the upstream closure design;
        # our profiles are pytree (eval_fn, params) pairs instead
        "args": None,
        "func": None,
        "keywords": None,
    },
}


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _public(obj):
    out = {}
    for name in dir(obj):
        if name.startswith("_"):
            continue
        out[name] = getattr(obj, name)
    return out


def test_toplevel_api_parity(ref):
    import cluster_generator_tpu as cg

    missing = []
    for name, obj in _public(ref).items():
        if isinstance(obj, types.ModuleType):
            continue
        ours = _TOPLEVEL_RENAMES.get(name, name)
        if ours is None:
            continue
        if not hasattr(cg, ours):
            missing.append(name)
    assert not missing, f"top-level API missing: {missing}"


@pytest.mark.parametrize("cls_name", ["ClusterModel", "ClusterParticles",
                                      "ClusterICs", "RadialProfile"])
def test_class_member_parity(ref, cls_name):
    import cluster_generator_tpu as cg

    ref_cls = getattr(ref, cls_name)
    our_cls = getattr(cg, cls_name)
    renames = _MEMBER_RENAMES.get(cls_name, {})
    missing = []
    for name in _public(ref_cls):
        ours = renames.get(name, name)
        if ours is None:
            continue
        if not hasattr(our_cls, ours):
            missing.append(name)
    assert not missing, f"{cls_name} members missing: {missing}"


def test_field_class_parity(ref):
    """Every public method of the reference's field front classes exists
    on ours (classes checked by name in test_toplevel_api_parity)."""
    import cluster_generator_tpu as cg

    for cls_name in ["RandomMagneticField", "RandomMagneticVectorPotential",
                     "RadialRandomMagneticField",
                     "RadialRandomMagneticVectorPotential",
                     "RandomVelocityField"]:
        ref_cls = getattr(ref, cls_name)
        our_cls = getattr(cg, cls_name)
        missing = [n for n in _public(ref_cls) if not hasattr(our_cls, n)]
        assert not missing, f"{cls_name} members missing: {missing}"


def test_migration_doc_symbols_exist():
    """Every identifier docs/migration.md's "What's identical" section
    names must actually resolve in the package — the doc is a promise to
    migrating users and must not drift."""
    import cluster_generator_tpu as cg
    import cluster_generator_tpu.utils as utils

    for name in ("ClusterModel", "HydrostaticEquilibrium",
                 "ClusterParticles", "ClusterICs",
                 "compute_centers_for_binary", "rescale_profile_by_mass",
                 "find_radius_mass", "find_overdensity_radius",
                 "setup_gamer_ics", "setup_flash_ics", "setup_ramses_ics",
                 "setup_arepo_ics", "resample_arepo_ics"):
        assert hasattr(cg, name), name
    for name in ("from_dens_and_tden", "from_dens_and_temp",
                 "from_dens_and_entr", "no_gas", "from_h5_file",
                 "check_hse", "check_dm_virial",
                 "set_magnetic_field_from_beta",
                 "generate_dm_particles", "generate_gas_particles",
                 "generate_star_particles", "generate_tracer_particles",
                 "create_dataset", "write_model_to_h5"):
        assert hasattr(cg.ClusterModel, name), name
    for name in ("integrate_mass", "integrate", "integrate_toinf",
                 "generate_particle_radii", "field_label_map"):
        assert hasattr(utils, name), name
    for name in ("RandomMagneticField", "RadialRandomMagneticField",
                 "RandomMagneticVectorPotential",
                 "RadialRandomMagneticVectorPotential",
                 "RandomVelocityField", "RadialRandomVelocityField"):
        assert hasattr(cg, name), name
    assert hasattr(cg.ClusterParticles, "write_to_gadget_file")
    assert hasattr(cg.ClusterParticles, "from_gadget_file")
    assert hasattr(cg.ClusterParticles, "from_gadget_files")


def test_api_index_doc_symbols_exist():
    """Every backticked identifier in docs/api.md must resolve somewhere
    in the package (top level or a documented submodule) — the API index
    is the symbol map users start from and must not drift as the
    parallel/consumption surface grows."""
    import re
    from pathlib import Path

    import cluster_generator_tpu as cg

    doc = (Path(__file__).resolve().parents[1]
           / "docs" / "api.md").read_text()
    submods = ["utils", "pipeline", "parallel", "parallel.fft",
               "parallel.fields", "parallel.export", "parallel.mesh",
               "parallel.ensemble", "codes", "data_structures", "virial",
               "sampling", "particles", "ics", "model.gravity",
               "core.interp", "core.scan_ops", "core.quadrature",
               "core.units", "core.profiling", "core.debug",
               "core.config", "core.aot", "core.h5raw", "fields.grf",
               "ops", "ops.native", "ops.pallas_kernels", "cli"]
    namespace = set(dir(cg)) | {m.split(".")[0] for m in submods}
    # frontend genuinely requires yt (api.md says so) and other tests in
    # this session may have installed a partial ytshim — don't import it
    namespace.add("frontend")
    import importlib

    for m in submods:
        mod = importlib.import_module(f"cluster_generator_tpu.{m}")
        namespace |= set(dir(mod))
        namespace.add(m.split(".")[-1])

    unresolved = []
    for tok in re.findall(r"`([^`]+)`", doc):
        if " " in tok or "=" in tok or "(" in tok:
            continue
        for part in tok.split("/"):
            # dotted names resolve as attribute chains from the package
            # (a leading short module name like "scan_ops" maps to its
            # documented submodule, e.g. core.scan_ops)
            if part == "cluster_generator_tpu.frontend":
                continue  # yt-gated; see the namespace note above
            if "." in part:
                tail = {m.split(".")[-1]: m for m in submods}
                comps = [c for c in part.split(".")
                         if c != "cluster_generator_tpu"]
                if comps and comps[0] in tail:
                    comps = tail[comps[0]].split(".") + comps[1:]
                obj = cg
                ok = True
                for comp in comps:
                    try:
                        obj = getattr(obj, comp)
                    except AttributeError:
                        try:
                            obj = importlib.import_module(
                                f"{obj.__name__}.{comp}")
                        except Exception:
                            ok = False
                            break
                if not ok:
                    unresolved.append(part)
            elif part not in namespace and part != "yt":
                unresolved.append(part)
    assert not unresolved, f"docs/api.md names unknown symbols: {unresolved}"
