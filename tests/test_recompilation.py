"""Compile-reuse audit (VERDICT r3 item 9): pins which knobs are
runtime values (reuse the compiled program) vs compile-time statics
(recompile is inherent — output shapes change).

A real multi-chip benchmark must be a config change, not a porting
round: physical parameters (masses, concentrations, centers, bulk
velocities, PRNG keys, r_max) are traced VALUES everywhere, so sweeping
them never re-lowers; particle counts, grid resolutions, and table
sizes are shape-defining STATICS, so each distinct value compiles once
and is then cached (in-process jit cache + .jax_cache across
processes).  The full knob table lives in docs/performance.md
("Compile-time vs runtime knobs")."""

import jax
import jax.numpy as jnp
import pytest


def _calls_compiled(fn, *argsets):
    """Run fn on each argset; return how many distinct programs the jit
    cache holds afterwards (cleared first)."""
    fn.clear_cache()
    for args in argsets:
        out = fn(*args)
        jax.block_until_ready(out)
    return fn._cache_size()


def test_merger_pipeline_physical_params_are_runtime():
    """Sweeping masses/concentrations/centers/velocities/rmax/key reuses
    ONE compiled headline program."""
    from cluster_generator_tpu.pipeline import merger_ic_fused

    counts = ((300, 200), (240, 160), (60, 40))
    base = dict(num_points=128)

    def args(m1, c1, vx, key):
        return (jnp.asarray([m1, 1.0e15]), jnp.asarray([c1, 5.0]),
                jnp.asarray([[-1500.0, 0.0, 0.0], [1500.0, 0.0, 0.0]]),
                jnp.asarray([[vx, 0.0, 0.0], [-0.45, 0.0, 0.0]]),
                jnp.asarray([5000.0, 4000.0]), jax.random.key(key))

    fn = jax.jit(lambda M, c, cen, vel, rmax, k: merger_ic_fused(
        M, c, cen, vel, rmax, k, *counts, **base))
    n = _calls_compiled(fn,
                        args(1.5e15, 4.0, 0.3, 0),
                        args(2.5e15, 6.5, -0.1, 1),
                        args(0.8e15, 3.1, 0.7, 2))
    assert n == 1


def test_datagen_factories_are_memoized():
    """Repeated ensemble_datagen-style calls with the same shapes get the
    SAME jitted program object; a changed count is a new program (shape
    change — inherent)."""
    from cluster_generator_tpu.parallel.ensemble import (
        _datagen_batch_fn,
        _datagen_full_batch_fn,
    )

    a = _datagen_batch_fn(128, 1000)
    b = _datagen_batch_fn(128, 1000)
    assert a is b
    assert _datagen_batch_fn(128, 2000) is not a

    fa = _datagen_full_batch_fn(128, 500, 400, 100)
    fb = _datagen_full_batch_fn(128, 500, 400, 100)
    assert fa is fb

    M = jnp.asarray([1.5e15, 1.0e15])
    c = jnp.asarray([4.0, 5.0])
    n = _calls_compiled(a,
                        (M, c, jax.random.key(0)),
                        (M * 1.7, c + 1.0, jax.random.key(3)))
    assert n == 1


def test_datagen_factory_sees_config_changes():
    """The factory memo key includes cgparams['numerical'] table knobs —
    a config change must NOT silently return the stale program."""
    from cluster_generator_tpu.core.config import cgparams
    from cluster_generator_tpu.parallel.ensemble import _datagen_batch_fn

    a = _datagen_batch_fn(128, 1000)
    old = cgparams["numerical"].get("df_node_grid_body", 4096)
    try:
        cgparams["numerical"]["df_node_grid_body"] = old // 2
        assert _datagen_batch_fn(128, 1000) is not a
    finally:
        cgparams["numerical"]["df_node_grid_body"] = old
    assert _datagen_batch_fn(128, 1000) is a


def test_ensemble_build_params_are_runtime():
    from cluster_generator_tpu.parallel.ensemble import build_ensemble

    M = jnp.asarray([1.0e15, 2.0e15, 0.5e15])
    c = jnp.asarray([4.0, 6.0, 3.0])
    # build_ensemble is itself jitted with static num_points
    out1 = build_ensemble(M, c, num_points=128)
    size_after_first = build_ensemble._cache_size()
    out2 = build_ensemble(M * 1.3, c + 0.5, num_points=128)
    jax.block_until_ready((out1, out2))
    assert build_ensemble._cache_size() == size_after_first


def test_grf_key_and_scale_are_runtime():
    """New PRNG seeds / physical cutoffs reuse the compiled GRF front
    program; only the grid shape (static) re-lowers."""
    from cluster_generator_tpu.fields.grf import (
        RandomMagneticField,
        _grf_core_fused,
        _rfft_kmath,
        _rfft_shape_one,
    )

    dims = (16, 16, 16)
    # staged rfft route (the f32 default) and the fused c64 route
    for probes, use_rfft in (((_rfft_shape_one, _rfft_kmath), None),
                             ((_grf_core_fused,), False)):
        for p in probes:
            p.clear_cache()
        for seed, l_min in ((42, 10.0), (7, 14.0)):
            f = RandomMagneticField([-100.0] * 3, [100.0] * 3, dims, l_min,
                                    80.0, 1.0e-6, padding=0.0, prng=seed,
                                    dtype=jnp.float32, use_rfft=use_rfft)
            jax.block_until_ready((f.gx, f.gy, f.gz))
        for p in probes:
            assert p._cache_size() == 1, (p, use_rfft)


def test_speed_table_profile_values_are_runtime():
    """Different (ee, f) node values — i.e. different clusters — reuse
    the compiled table-build program."""
    import numpy as np

    from cluster_generator_tpu.virial import (
        speed_inverse_cdf_table,
        speed_table_defaults,
    )

    kw = speed_table_defaults()
    speed_inverse_cdf_table.clear_cache()
    for scale in (1.0, 2.5):
        ee = jnp.asarray(np.linspace(0.0, 3.0 * scale, 64))
        f = jnp.asarray(np.exp(np.linspace(0.0, 2.0, 64)) * scale)
        tab = speed_inverse_cdf_table(ee, f, row_ee=ee[::8], **kw)
        jax.block_until_ready(tab)
    assert speed_inverse_cdf_table._cache_size() == 1


M200_2 = jnp.asarray([1.5e15, 1.0e15])
CONC_2 = jnp.asarray([4.0, 5.0])
CENTERS_2 = jnp.asarray([[-1500.0, 0.0, 0.0], [1500.0, 0.0, 0.0]])
VELS_2 = jnp.asarray([[0.3, 0.0, 0.0], [-0.3, 0.0, 0.0]])
RMAX_2 = jnp.asarray([3000.0, 3000.0])


@pytest.mark.slow
def test_count_change_reuses_build_and_table_executables():
    """The staged-path contract: changing n_part re-lowers ONLY the draw
    program; model builds and table builds reuse their executables (they
    are keyed on grid/table resolution, not particle counts)."""
    from cluster_generator_tpu import pipeline as pl

    for f in (pl.build_merger_models, pl.build_speed_tables,
              pl.build_radius_tables, pl.sample_merger_ic):
        f.clear_cache()

    fields = pl.build_merger_models(M200_2, CONC_2, num_points=256)
    tables = pl.build_speed_tables(fields)
    tables["radius"] = pl.build_radius_tables(fields, RMAX_2)

    for n in ((2_000, 1_000), (4_000, 2_000)):
        pl.sample_merger_ic(fields, tables, CENTERS_2, VELS_2, RMAX_2,
                            jax.random.key(0), n, n, n)
    # a fresh key and a different r_max VALUE are plain array inputs:
    # no new executable anywhere
    tables["radius"] = pl.build_radius_tables(fields, 0.9 * RMAX_2)
    pl.sample_merger_ic(fields, tables, CENTERS_2, VELS_2, 0.9 * RMAX_2,
                        jax.random.key(7), (4_000, 2_000), (4_000, 2_000),
                        (4_000, 2_000))

    assert pl.build_merger_models._cache_size() == 1
    assert pl.build_speed_tables._cache_size() == 1
    assert pl.build_radius_tables._cache_size() == 1
    assert pl.sample_merger_ic._cache_size() == 2


@pytest.mark.slow
def test_fused_program_recompiles_on_count_change_by_design():
    """merger_ic_fused is ONE program (it exists to cut axon RPC
    round-trips, pipeline.py:389) so a count change re-lowers the whole
    fusion — the staged path above is the cheap-re-draw path."""
    from cluster_generator_tpu.pipeline import merger_ic_fused

    merger_ic_fused.clear_cache()
    for n in ((2_000, 1_000), (4_000, 2_000)):
        merger_ic_fused(M200_2, CONC_2, CENTERS_2, VELS_2, RMAX_2,
                        jax.random.key(0), n, n, n, num_points=256)
    # same counts, new key/values: reused
    merger_ic_fused(M200_2, CONC_2, 1.01 * CENTERS_2, VELS_2, RMAX_2,
                    jax.random.key(3), (4_000, 2_000), (4_000, 2_000),
                    (4_000, 2_000), num_points=256)
    assert merger_ic_fused._cache_size() == 2
