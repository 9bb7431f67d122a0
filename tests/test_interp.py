"""Cubic spline vs scipy (values, derivatives, extrapolation)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline as ScipyCubic
from scipy.interpolate import InterpolatedUnivariateSpline as IUS

from cluster_generator_tpu.core.interp import cubic_spline, spline_eval


def test_values_match_scipy_not_a_knot():
    x = np.logspace(-1, 4, 500)
    y = np.sin(x / 500.0) + x**0.3
    sp = cubic_spline(jnp.asarray(x), jnp.asarray(y))
    xq = np.logspace(-1, 4, 3173)
    mine = np.asarray(spline_eval(sp, jnp.asarray(xq)))
    ref = ScipyCubic(x, y, bc_type="not-a-knot")(xq)
    assert np.abs(mine - ref).max() < 1e-10 * np.abs(ref).max()


def test_derivative_matches_scipy_ius():
    # the reference differentiates InterpolatedUnivariateSpline everywhere
    # (model.py:512-522); a not-a-knot C2 spline agrees away from the ends
    x = np.logspace(-1, 4, 1000)
    y = 1.0 / (x * (1 + x / 500.0) ** 2)
    sp = cubic_spline(jnp.asarray(x), jnp.asarray(y))
    dmine = np.asarray(spline_eval(sp, jnp.asarray(x), nu=1))
    dref = IUS(x, y)(x, 1)
    denom = np.abs(dref).max()
    assert np.abs(dmine - dref).max() / denom < 1e-6


def test_extrapolation_is_boundary_polynomial():
    x = np.linspace(1.0, 2.0, 50)
    y = x**3
    sp = cubic_spline(jnp.asarray(x), jnp.asarray(y))
    # cubic data -> exact everywhere, including outside the domain
    for xq in [0.5, 2.5]:
        assert abs(float(spline_eval(sp, xq)) - xq**3) < 1e-9


def test_jit_vmap_compatible():
    x = jnp.linspace(0.0, 1.0, 64)
    ys = jnp.stack([jnp.sin(3 * x), jnp.cos(2 * x)])
    sps = jax.vmap(cubic_spline, in_axes=(None, 0))(x, ys)
    vals = jax.vmap(lambda sp: spline_eval(sp, jnp.linspace(0, 1, 10)))(sps)
    assert vals.shape == (2, 10)
    assert np.allclose(np.asarray(vals[0]), np.sin(3 * np.linspace(0, 1, 10)),
                       atol=1e-6)


def test_pcr_matches_thomas_and_scipy():
    """The parallel-cyclic-reduction solve equals the sequential Thomas
    solve to f64 roundoff on random diagonally-dominant systems."""
    import numpy as np
    from cluster_generator_tpu.core.interp import _pcr, _thomas

    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 64, 1000, 1023):
        dl = jnp.asarray(rng.uniform(0.5, 1.5, n - 1))
        du = jnp.asarray(rng.uniform(0.5, 1.5, n - 1))
        dm = jnp.asarray(rng.uniform(4.0, 6.0, n))
        rhs = jnp.asarray(rng.normal(size=n))
        x_pcr = np.asarray(_pcr(dl, dm, du, rhs))
        x_tho = np.asarray(_thomas(dl, dm, du, rhs))
        np.testing.assert_allclose(x_pcr, x_tho, rtol=1e-12, atol=1e-12)
        # residual check against the actual matrix
        A = np.diag(np.asarray(dm)) + np.diag(np.asarray(dl), -1) \
            + np.diag(np.asarray(du), 1)
        np.testing.assert_allclose(A @ x_pcr, np.asarray(rhs),
                                   rtol=1e-10, atol=1e-10)


def test_spline_randomized_grids_vs_scipy():
    """Stress the PCR spline on adversarial grids: random sizes
    (non-powers-of-2 included — PCR's shift fills must handle every n),
    wildly non-uniform spacing (log + jitter, ratios up to ~1e5), and
    rough data. Values and first derivatives must match scipy's
    not-a-knot spline everywhere."""
    from scipy.interpolate import CubicSpline as SciCS

    from cluster_generator_tpu.core.interp import cubic_spline, spline_eval

    rng = np.random.default_rng(42)
    for n in (5, 17, 33, 100, 257, 1000, 1023):
        # non-uniform: log-spaced base with multiplicative jitter
        x = np.sort(np.unique(
            np.logspace(-2, 3, n) * np.exp(rng.normal(0, 0.2, n))))
        y = np.sin(np.log(x)) * x**0.3 + rng.normal(0, 0.01, x.size)
        sp = cubic_spline(jnp.asarray(x), jnp.asarray(y))
        ref = SciCS(x, y, bc_type="not-a-knot")
        q = np.sort(rng.uniform(x[0], x[-1], 500))
        np.testing.assert_allclose(np.asarray(spline_eval(sp, jnp.asarray(q))),
                                   ref(q), rtol=1e-8, atol=1e-10,
                                   err_msg=f"n={x.size} values")
        np.testing.assert_allclose(
            np.asarray(spline_eval(sp, jnp.asarray(q), nu=1)),
            ref(q, 1), rtol=1e-6, atol=1e-8, err_msg=f"n={x.size} deriv")


def test_spline_eval_uniform_matches_searchsorted_route():
    """spline_eval_uniform (scatter+cumsum bracketing, one row-of-5
    gather per node) is bit-identical to spline_eval at the same uniform
    nodes, including below-range extrapolation and nodes exactly on
    knots."""
    from cluster_generator_tpu.core.interp import (
        cubic_spline,
        spline_eval,
        spline_eval_uniform,
    )

    rng = np.random.default_rng(5)
    for trial in range(4):
        n_knots = int(rng.integers(8, 200))
        x = jnp.asarray(np.sort(rng.uniform(0.1, 10.0, n_knots)))
        y = jnp.asarray(rng.standard_normal(n_knots))
        sp = cubic_spline(x, y)
        for lo, step, n in [
            (0.0, float(x[-1]) / 500, 501),        # spans below + inside
            (float(x[0]), (float(x[-1]) - float(x[0])) / 63, 64),
            (float(x[3]), 1e-3, 17),               # starts ON a knot
        ]:
            nodes = lo + step * jnp.arange(n, dtype=x.dtype)
            expect = spline_eval(sp, nodes)
            got = spline_eval_uniform(sp, jnp.asarray(lo), jnp.asarray(step),
                                      n)
            np.testing.assert_array_equal(np.asarray(expect),
                                          np.asarray(got))


def test_spline_eval_at_shares_one_bracketing_pass():
    """spline_eval_at with bracket_for_spline indices is bit-identical
    to spline_eval — several same-knot splines (multiple fields at the
    same particle radii) can share ONE searchsorted pass."""
    from cluster_generator_tpu.core.interp import (
        bracket_for_spline,
        cubic_spline,
        spline_eval,
        spline_eval_at,
    )

    rng = np.random.default_rng(9)
    x = jnp.asarray(np.sort(rng.uniform(0.1, 10.0, 64)))
    xq = jnp.asarray(np.concatenate([
        rng.uniform(0.0, 11.0, 300),     # below, inside, above range
        np.asarray(x)[[0, 5, 63]],       # exactly on knots
    ]))
    idx = bracket_for_spline(x, xq)
    for seed in range(3):  # three "fields" on the same knots
        y = jnp.asarray(np.random.default_rng(seed).standard_normal(64))
        sp = cubic_spline(x, y)
        np.testing.assert_array_equal(np.asarray(spline_eval(sp, xq)),
                                      np.asarray(spline_eval_at(sp, xq,
                                                                idx)))


def test_bracket_indices_and_interp_monotone_match_searchsorted():
    """bracket_indices (compare-matrix bracketing — vmapped searchsorted
    was a dominant TPU table-build stage, r4_cfg5b_stages.log) matches
    searchsorted(side='right')-1 clipped, and interp_monotone matches
    jnp.interp including out-of-range clamping, queries exactly on knots,
    and flat (duplicate-x) intervals."""
    from cluster_generator_tpu.core.interp import (
        bracket_indices,
        interp_monotone,
    )

    rng = np.random.default_rng(11)
    for trial in range(4):
        n = int(rng.integers(8, 300))
        x = np.sort(rng.uniform(0.0, 10.0, n))
        y = rng.standard_normal(n)
        q = np.concatenate([
            rng.uniform(-1.0, 11.0, 400),
            x[rng.integers(0, n, 20)],          # exactly on knots
            [x[0], x[-1], -5.0, 50.0],
        ])
        jref = np.clip(np.searchsorted(x, q, side="right") - 1, 0, n - 2)
        jgot = np.asarray(bracket_indices(jnp.asarray(x), jnp.asarray(q)))
        np.testing.assert_array_equal(jgot, jref)
        got = np.asarray(interp_monotone(jnp.asarray(q), jnp.asarray(x),
                                         jnp.asarray(y)))
        expect = np.asarray(jnp.interp(jnp.asarray(q), jnp.asarray(x),
                                       jnp.asarray(y)))
        np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)

    # flat interval: interp_monotone takes the left value, no 0/0
    x = jnp.asarray([0.0, 1.0, 1.0, 2.0])
    y = jnp.asarray([0.0, 10.0, 20.0, 30.0])
    out = np.asarray(interp_monotone(jnp.asarray([1.0]), x, y))
    assert np.isfinite(out).all()


def test_loguniform_computed_index_paths():
    """loguniform_lerp matches np.interp and spline_eval_loguniform
    matches the searched spline_eval on a log-uniform grid (in-range and
    clamped-boundary queries); is_loguniform gates correctly."""
    import numpy as np

    from cluster_generator_tpu.core.interp import (
        cubic_spline,
        is_loguniform,
        loguniform_lerp,
        spline_eval,
        spline_eval_loguniform,
    )

    rng = np.random.default_rng(11)
    x = np.geomspace(0.1, 1e4, 513)
    y = np.log1p(x) / (1.0 + (x / 50.0) ** 1.7)
    assert is_loguniform(x)
    assert not is_loguniform(np.linspace(1.0, 2.0, 64))
    assert not is_loguniform(np.concatenate([x[:100], x[100:] * 1.01]))

    q = rng.uniform(0.1, 1e4, 20000)
    q[:3] = [0.1, 1e4, 0.1000001]  # boundary + near-boundary
    got = np.asarray(loguniform_lerp(jnp.asarray(q), jnp.asarray(x),
                                     jnp.asarray(y)))
    np.testing.assert_allclose(got, np.interp(q, x, y), rtol=5e-13,
                               atol=1e-15)

    sp = cubic_spline(jnp.asarray(x), jnp.asarray(y))
    got = np.asarray(spline_eval_loguniform(sp, jnp.asarray(q)))
    want = np.asarray(spline_eval(sp, jnp.asarray(q)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)

    # out-of-range queries clamp to the boundary value (no extrapolation)
    qq = jnp.asarray([0.01, 2e4])
    np.testing.assert_allclose(
        np.asarray(loguniform_lerp(qq, jnp.asarray(x), jnp.asarray(y))),
        [y[0], y[-1]], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(spline_eval_loguniform(sp, qq)), [y[0], y[-1]],
        rtol=1e-12)
