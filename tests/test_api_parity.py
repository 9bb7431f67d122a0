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
