"""TPU f64-emulation range guard.

TPU has no native f64; XLA emulates it with float32 pairs, so the usable
EXPONENT range is float32's (~1e+/-38).  Constants like mp (8.4e-58 Msun)
or keV (7.3e-61 galactic) individually underflow on device — they must be
folded together on the host before tracing (model/builders.py).  This bit
the framework for a full round: temperature/entropy were NaN on real TPU
while every CPU test passed (found via reference-parity comparison run on
the axon backend, round 2).

The guard scans the lowered StableHLO of the fused compute programs for
any literal whose decimal exponent lies outside [-38, 38].
"""

import re

import jax.numpy as jnp
import pytest

_EXP = re.compile(r"[0-9.]+[eE]([+-])([0-9]+)")


def _out_of_range_constants(hlo_text, limit=39):
    bad = set()
    for m in _EXP.finditer(hlo_text):
        exp = int(m.group(2)) * (1 if m.group(1) == "+" else -1)
        if exp <= -limit or exp >= limit:
            bad.add(m.group(0))
    return sorted(bad)


@pytest.mark.parametrize("n_grid", [128])
def test_merger_models_hlo_within_f32_exponent_range(n_grid):
    from cluster_generator_tpu.pipeline import build_merger_models

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    text = build_merger_models.lower(M200, conc,
                                     num_points=n_grid).as_text()
    bad = _out_of_range_constants(text)
    assert not bad, f"constants outside TPU emulated-f64 range: {bad[:10]}"


def test_merger_fused_hlo_within_f32_exponent_range():
    import jax

    from cluster_generator_tpu.pipeline import merger_ic_fused

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0.0, 0.0], [1500.0, 0.0, 0.0]])
    vels = jnp.asarray([[0.3, 0.0, 0.0], [-0.45, 0.0, 0.0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    text = merger_ic_fused.lower(
        M200, conc, centers, vels, rmax, jax.random.key(0),
        (64, 64), (64, 64), (64, 64), num_points=128).as_text()
    bad = _out_of_range_constants(text)
    assert not bad, f"constants outside TPU emulated-f64 range: {bad[:10]}"


def test_temperature_finite_and_positive():
    """The concrete symptom the range guard protects against."""
    import numpy as np

    from cluster_generator_tpu.pipeline import build_merger_models

    f = build_merger_models(jnp.asarray([1.5e15]), jnp.asarray([4.0]),
                            num_points=256)
    for name in ("temperature", "entropy", "pressure"):
        a = np.asarray(f[name])
        assert np.isfinite(a).all(), name
        assert (a > 0).all(), name
