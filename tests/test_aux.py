"""Auxiliary subsystems: utils compat shim, profiling, debug sanitizers,
plotting smoke (SURVEY.md §5)."""

import numpy as np
import pytest

import cluster_generator_tpu as cg


def test_utils_shim_quadrature():
    from scipy.integrate import quad

    from cluster_generator_tpu import utils

    p = cg.nfw_density_profile(1.0e7, 500.0)
    rr = np.logspace(-1, 3, 200)
    m = utils.integrate_mass(p, rr)
    ref = 4 * np.pi * quad(lambda r: 1e7 / ((r / 500) * (1 + r / 500) ** 2)
                           * r * r, 0, rr[-1], limit=200)[0]
    assert abs(m[-1] - ref) / ref < 1e-8
    # integrate / integrate_toinf relationship
    fn = cg.power_law_profile(1.0, 100.0, -3.0)
    i1 = utils.integrate(fn, rr)
    i2 = utils.integrate_toinf(fn, rr)
    assert (i2 > i1).all()
    tail_ref = quad(lambda r: (r / 100.0) ** -3, rr[-1], np.inf)[0]
    assert abs((i2[-1] - i1[-1]) - tail_ref) / tail_ref < 1e-8


def test_utils_constants_exposed():
    from cluster_generator_tpu import utils

    assert 4.4e-12 < utils.G < 4.6e-12  # kpc^3/(Msun Myr^2)
    assert utils.mu == pytest.approx(1.0 / (2 * 0.76 + 0.75 * 0.24))
    assert "density" in utils.field_label_map


def test_stage_timer_and_memory_stats():
    import jax.numpy as jnp

    from cluster_generator_tpu.core.profiling import (
        StageTimes,
        device_memory_stats,
        stage,
    )

    acc = StageTimes()
    holder = []
    with stage("toy", holder, accumulate=acc, log=False):
        holder.append(jnp.ones(10) * 2)
    assert "toy" in acc.times and acc.times["toy"] >= 0
    acc.report()
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_validate_model_fields(canonical_model):
    from cluster_generator_tpu.core.debug import validate_model_fields

    assert validate_model_fields(canonical_model.fields) == []
    bad = dict(canonical_model.fields)
    bad["density"] = -np.abs(bad["density"])
    with pytest.raises(ValueError):
        validate_model_fields(bad)
    problems = validate_model_fields(bad, raise_on_error=False)
    assert any("density" in p for p in problems)


def test_nan_guard():
    import jax
    import jax.numpy as jnp

    from cluster_generator_tpu.core.debug import nan_guard

    with nan_guard():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # restored afterwards
    assert not jax.config.jax_debug_nans


def test_plot_smoke(canonical_model, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    fig, ax = canonical_model.plot("density")
    fig.savefig(tmp_path / "density.png")
    p = cg.nfw_density_profile(1.0e7, 500.0)
    fig2, ax2 = p.plot(0.1, 1000.0)
    fig2.savefig(tmp_path / "profile.png")
    assert (tmp_path / "density.png").exists()
