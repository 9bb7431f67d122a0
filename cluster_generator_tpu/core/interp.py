"""Interpolation primitives: linear interp and C2 cubic splines in pure JAX.

The reference leans on ``scipy.interpolate.InterpolatedUnivariateSpline`` for
every derivative and resampling operation (model.py:512-522, virial.py:44-67,
particles.py:615-624).  A FITPACK interpolating cubic spline (s=0) is
equivalent to a C2 cubic spline with not-a-knot boundary conditions, which we
build here with a parallel-cyclic-reduction tridiagonal solve (log-depth,
all-vectorized — the sequential Thomas scan was the latency bottleneck of
every model build on TPU) — jit-safe, vmappable, differentiable.

API:
    coeffs = cubic_spline(x, y)              # pytree of per-interval coeffs
    v  = spline_eval(coeffs, xq)             # values
    d  = spline_eval(coeffs, xq, nu=1)       # first derivative
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CubicSpline", "cubic_spline", "spline_eval", "interp",
           "adjacent_pairs", "pair_col_lerp", "loguniform_lerp",
           "is_loguniform", "spline_eval_loguniform"]


def adjacent_pairs(t):
    """Stack adjacent elements of the last axis as ``(..., n-1, 2)`` rows.

    Lerp tables are stored this way so ONE contiguous row-of-2 gather
    fetches both endpoints — on TPU that costs ~2.7x less than a single
    scalar gather (measured, scripts/tpu_gather_experiments2.py).  Every
    paired-table site shares this helper so the pairing convention can't
    drift.

    Per-particle gathers of these tables go through :func:`pair_col_lerp`
    / the transposed-column idiom: gathering ``pairs[idx]`` materializes
    an ``[N, 2]`` temp that the TPU T(8,128) tile layout pads 64x (the
    ``[N, 4]`` form 32x — it compile-OOM'd the 1e6-particle/cluster
    datagen at batch 64, 15.26 GB for one temp), while the transposed
    ``pairs.T[:, idx]`` gather pads the SAME values only 2-4x at
    identical measured speed (84.0 vs 84.8 ms for 8e6 draws,
    benchmarks/measurements_r5/r5_gather_layout.log).
    """
    return jnp.stack([t[..., :-1], t[..., 1:]], axis=-1)


def pair_col_lerp(pairs, idx, w):
    """Lerp of an adjacent-pair table at integer rows ``idx`` with
    weights ``w`` — via the transposed COLUMN gather (see
    :func:`adjacent_pairs` on why: same speed, 16-32x less padded HBM
    than ``pairs[idx]``)."""
    c = pairs.T[:, idx]  # (2, N)
    return (1.0 - w) * c[0] + w * c[1]


class CubicSpline(NamedTuple):
    """Per-interval polynomial: y = a + b*t + c*t^2 + d*t^3, t = x - x_i."""

    x: jnp.ndarray  # knots, shape (N,)
    a: jnp.ndarray  # (N-1,)
    b: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray


def _pcr(dl, dm, du, rhs):
    """Tridiagonal solve by parallel cyclic reduction — ceil(log2 n)
    vectorized elimination rounds instead of the Thomas algorithm's 2n
    sequential scan steps.

    Each round eliminates every row's coupling to its +-stride neighbors
    simultaneously (out-of-range neighbors enter as identity rows via the
    shift fills), doubling the coupling distance; once it exceeds n the
    system is diagonal.  Stable for diagonally-dominant systems — the
    spline system is d.d. by a factor of 2.  On TPU this turns the spline
    solve from the latency-bound hot spot of every model build (a 4096-pt
    build was ~0.26 s of almost pure scan dispatch) into ~12 cheap fused
    elementwise rounds.
    """
    import math

    n = dm.shape[0]
    a = jnp.concatenate([jnp.zeros((1,), dm.dtype), dl])   # row i, col i-s
    b = dm
    c = jnp.concatenate([du, jnp.zeros((1,), dm.dtype)])   # row i, col i+s
    d = rhs
    s = 1
    for _ in range(int(math.ceil(math.log2(max(int(n), 2))))):
        def dn(x, fill):
            return jnp.concatenate(
                [jnp.full((s,), fill, x.dtype), x[:-s]])

        def up(x, fill):
            return jnp.concatenate(
                [x[s:], jnp.full((s,), fill, x.dtype)])

        alpha = -a / dn(b, 1.0)
        gamma = -c / up(b, 1.0)
        b = b + alpha * dn(c, 0.0) + gamma * up(a, 0.0)
        d = d + alpha * dn(d, 0.0) + gamma * up(d, 0.0)
        a, c = alpha * dn(a, 0.0), gamma * up(c, 0.0)
        s *= 2
    return d / b


def _thomas(dl, dm, du, rhs):
    """Solve tridiagonal system (sub dl, diag dm, super du) via lax.scan.

    Kept as the sequential reference implementation; production solves go
    through :func:`_pcr` (log-depth, TPU-friendly)."""

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = inp
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (d_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    n = dm.shape[0]
    inputs = (jnp.concatenate([jnp.zeros((1,), dm.dtype), dl]),
              dm,
              jnp.concatenate([du, jnp.zeros((1,), dm.dtype)]),
              rhs)
    (_, _), (cps, dps) = jax.lax.scan(fwd, (jnp.zeros((), dm.dtype), jnp.zeros((), dm.dtype)),
                                      inputs)

    def bwd(x_next, inp):
        cp_i, dp_i = inp
        x_i = dp_i - cp_i * x_next
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, jnp.zeros((), dm.dtype), (cps, dps), reverse=True)
    return xs


@jax.jit
def cubic_spline(x: jnp.ndarray, y: jnp.ndarray) -> CubicSpline:
    """Not-a-knot C2 cubic spline through (x, y).  x strictly increasing.

    jitted at definition: the Thomas-scan is pathological to dispatch
    eagerly; under an enclosing jit the nested jit inlines."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    h = x[1:] - x[:-1]  # (n-1,)
    slope = (y[1:] - y[:-1]) / h

    # Solve for second derivatives sigma (n unknowns) with not-a-knot BCs.
    # Interior rows i=1..n-2: h[i-1] s_{i-1} + 2(h[i-1]+h[i]) s_i + h[i] s_{i+1}
    #                         = 6 (slope[i] - slope[i-1])
    dm = jnp.zeros((n,), x.dtype)
    dl = jnp.zeros((n - 1,), x.dtype)  # sub-diagonal (row i, col i-1)
    du = jnp.zeros((n - 1,), x.dtype)  # super-diagonal (row i, col i+1)
    rhs = jnp.zeros((n,), x.dtype)

    dm = dm.at[1:-1].set(2.0 * (h[:-1] + h[1:]))
    dl = dl.at[: n - 2].set(h[:-1])      # rows 1..n-2 use dl index i-1
    du = du.at[1:].set(h[1:])            # rows 1..n-2 use du index i
    rhs = rhs.at[1:-1].set(6.0 * (slope[1:] - slope[:-1]))

    # Not-a-knot row 0:   h1*s0 - (h0+h1)*s1 + h0*s2 = 0
    # expressed in tridiagonal form by eliminating s2 against row 1 is messy;
    # instead use the standard trick: fold the third-derivative continuity
    # condition into a modified first/last row that stays tridiagonal:
    #   row 0: (h0 - h1^2/ h?) ... —
    # Simpler closed treatment: s0 = ((h0+h1) s1 - h0 s2)/h1 is substituted
    # into interior row 1; symmetric for the last row.
    h0, h1 = h[0], h[1]
    hn2, hn1 = h[-2], h[-1]

    # Row 1 original: h0 s0 + 2(h0+h1) s1 + h1 s2 = rhs[1]
    # Substitute s0 = ((h0+h1) s1 - h0 s2) / h1:
    #   [h0 (h0+h1)/h1 + 2(h0+h1)] s1 + [h1 - h0^2/h1] s2 = rhs[1]
    dm = dm.at[1].set(h0 * (h0 + h1) / h1 + 2.0 * (h0 + h1))
    du = du.at[1].set(h1 - h0 * h0 / h1)
    # Row n-2 original: h[n-3] s_{n-3} + 2(h[n-3]+h[n-2]) s_{n-2} + h[n-2] s_{n-1}
    # Substitute s_{n-1} = ((h_{n-2}+h_{n-1}) s_{n-2} - h_{n-1} s_{n-3}) / h_{n-2}:
    dm = dm.at[-2].set(2.0 * (hn2 + hn1) + hn1 * (hn2 + hn1) / hn2)
    dl = dl.at[n - 3].set(hn2 - hn1 * hn1 / hn2)

    # Decoupled boundary placeholders (s0, s_{n-1} recovered afterwards);
    # rows 1 and n-2 no longer reference them after the substitution.
    dm = dm.at[0].set(1.0)
    du = du.at[0].set(0.0)
    dm = dm.at[-1].set(1.0)
    dl = dl.at[-1].set(0.0)
    dl = dl.at[0].set(0.0)      # row 1 coeff of s0 eliminated
    du = du.at[n - 2].set(0.0)  # row n-2 coeff of s_{n-1} eliminated

    sigma = _pcr(dl, dm, du, rhs)
    s0 = ((h0 + h1) * sigma[1] - h0 * sigma[2]) / h1
    sn = ((hn2 + hn1) * sigma[-2] - hn1 * sigma[-3]) / hn2
    sigma = sigma.at[0].set(s0)
    sigma = sigma.at[-1].set(sn)

    a = y[:-1]
    b = slope - h * (2.0 * sigma[:-1] + sigma[1:]) / 6.0
    c = sigma[:-1] / 2.0
    d = (sigma[1:] - sigma[:-1]) / (6.0 * h)
    return CubicSpline(x=x, a=a, b=b, c=c, d=d)


def spline_eval(sp: CubicSpline, xq, nu: int = 0):
    """Evaluate spline (or its nu-th derivative, nu<=2) at points ``xq``.

    Out-of-range queries extrapolate with the boundary polynomial, matching
    scipy's InterpolatedUnivariateSpline(ext=0) behavior the reference relies
    on at grid edges (SURVEY.md §7 hard part (b)).
    """
    xq = jnp.asarray(xq)
    idx = jnp.clip(jnp.searchsorted(sp.x, xq, side="right") - 1, 0, sp.x.shape[0] - 2)
    t = xq - sp.x[idx]
    a, b, c, d = sp.a[idx], sp.b[idx], sp.c[idx], sp.d[idx]
    if nu == 0:
        return a + t * (b + t * (c + t * d))
    if nu == 1:
        return b + t * (2.0 * c + 3.0 * t * d)
    if nu == 2:
        return 2.0 * c + 6.0 * t * d
    raise ValueError("nu must be 0, 1 or 2")


def bracket_for_spline(x, xq):
    """One searchsorted bracketing pass over knots ``x`` for queries
    ``xq``, reusable across several SAME-KNOT splines via
    :func:`spline_eval_at` — per-particle searches are the measured hot
    pattern (see :func:`bracket_indices`), so when multiple fields are
    evaluated at the same radii, pay for exactly one."""
    return jnp.clip(jnp.searchsorted(x, jnp.asarray(xq), side="right") - 1,
                    0, x.shape[0] - 2)


def spline_eval_at(sp: CubicSpline, xq, idx):
    """:func:`spline_eval` with PRECOMPUTED bracket indices (from
    :func:`bracket_for_spline` on the same knots).  Bit-identical to
    ``spline_eval(sp, xq)`` (pinned by test)."""
    t = jnp.asarray(xq) - sp.x[idx]
    return sp.a[idx] + t * (sp.b[idx] + t * (sp.c[idx] + t * sp.d[idx]))


def spline_eval_uniform(sp: CubicSpline, lo, step, n: int):
    """Evaluate a spline at the UNIFORM nodes ``lo + i*step, i in [0, n)``
    without any per-node binary search.

    ``spline_eval``'s searchsorted costs ~9 compare+gather rounds per
    query; for uniform queries the bracketing interval of every node is
    recoverable from the opposite direction — scatter one count per
    spline BREAKPOINT onto the node grid (its position there is a
    computed index) and prefix-sum: ``idx_i = (# x_k <= node_i) - 1``.
    Cost: len(x) scatters + one (n+1) cumsum + ONE row-of-5 coefficient
    gather per node, vs ~14 gathers per node for the search route.
    Bit-identical to ``spline_eval`` at the same nodes (pinned by
    tests/test_interp.py), including the boundary-polynomial
    extrapolation for nodes outside the knot range.
    """
    from .scan_ops import cumsum

    x = sp.x
    # first node index at-or-above x_k: node_i >= x_k  <=>  i >= (x_k-lo)/step
    pos = jnp.clip(jnp.ceil((x - lo) / step).astype(jnp.int32), 0, n)
    cnt = jnp.zeros((n + 1,), jnp.int32).at[pos].add(1)
    count = cumsum(cnt, axis=0)[:n]  # inclusive: # breakpoints <= node_i
    idx = jnp.clip(count - 1, 0, x.shape[0] - 2)
    rows = jnp.stack([x[:-1], sp.a, sp.b, sp.c, sp.d], axis=1)
    r = rows[idx]  # one row-of-5 gather per node
    t = (lo + step * jnp.arange(n, dtype=x.dtype)) - r[:, 0]
    return r[:, 1] + t * (r[:, 2] + t * (r[:, 3] + t * r[:, 4]))


def spline_eval_loguniform(sp: CubicSpline, xq):
    """Evaluate a spline whose knots are EXACTLY log-uniform at arbitrary
    in-range queries — the bracketing interval is COMPUTED from
    ``log(xq)`` (no search), then one row-of-5 coefficient gather per
    query.  Cubic-exact like :func:`spline_eval` (pinned by test) at the
    per-particle lookup cost of the paired-gather idiom.  Queries are
    clamped to the knot range (boundary value, no extrapolation)."""
    x = sp.x
    n = x.shape[0]
    dt = x.dtype
    lg0 = jnp.log(x[0]).astype(dt)
    dlg = ((jnp.log(x[-1]) - lg0) / (n - 1)).astype(dt)
    t = (jnp.log(xq).astype(dt) - lg0) / dlg
    t = jnp.clip(t, 0.0, n - 1 - 1e-6)
    j = jnp.minimum(t.astype(jnp.int32), n - 2)  # f32 ulp guard
    rows = jnp.stack([x[:-1], sp.a, sp.b, sp.c, sp.d], axis=1)
    r = rows[j]
    u = jnp.clip(xq, x[0], x[-1]) - r[:, 0]
    return r[:, 1] + u * (r[:, 2] + u * (r[:, 3] + u * r[:, 4]))


def interp(xq, x, y, left=None, right=None):
    """jnp.interp passthrough (reference's np.interp, utils.py:165)."""
    return jnp.interp(xq, x, y, left=left, right=right)


def bracket_indices(grid, queries):
    """Bracketing interval index of each query in an ascending ``grid``,
    via one comparison matrix + row reduce.

    ``jnp.searchsorted`` / ``jnp.interp`` lower to sequential
    binary-search rounds whose per-round gathers dominate vmapped table
    builds on TPU: the per-stage timing (benchmarks/measurements_r4/
    r4_cfg5b_stages.log) put ~0.6 s PER 2048-query interp on the
    1024-cluster datagen batch, ~2 s total — while the (queries x grid)
    compare+reduce is plain vector work (~1M ops per cluster here, well
    under the HBM stream floor).  Matches ``searchsorted(side='right')-1``
    clipped to valid intervals: grid[j] <= q < grid[j+1].
    """
    j = jnp.sum((grid[None, :] <= queries[:, None]).astype(jnp.int32),
                axis=1) - 1
    return jnp.clip(j, 0, grid.shape[0] - 2)


def loguniform_lerp(xq, x, y):
    """``y`` interpolated at ``xq`` on an EXACTLY log-uniform ascending
    grid ``x``: the bracketing interval is COMPUTED from ``log(xq)`` (no
    search) and both endpoints come back as one row-of-4 gather
    (x0,y0,x1,y1) — the per-particle lookup idiom (see
    pipeline._log_grid_locate; row width 4 is the measured gather knee).

    This is how particle field values should be evaluated at DRAWN radii:
    lerping field values between radius-quantile nodes instead (the
    radius draw's own (kq, wq)) is exact for the radius but NOT for a
    curved field — the innermost mass-quantile bin spans a huge radius
    range, and 1.5 P/rho across it is off by up to ~60% (caught by
    verify_catalog on a deep gas draw).  On the model's log grid the
    curvature error is ~1e-4.

    Queries are clamped to the grid (boundary value, no extrapolation).
    The lerp weight is linear IN x (np.interp semantics) — only the
    interval index comes from log space; a log-space weight would differ
    from np.interp by the exp curvature over one interval (~1e-4 at
    512-pt grids).
    """
    n = x.shape[0]
    dt = y.dtype
    x = x.astype(dt)
    lg0 = jnp.log(x[0])
    dlg = (jnp.log(x[-1]) - lg0) / (n - 1)
    t = (jnp.log(xq).astype(dt) - lg0) / dlg
    t = jnp.clip(t, 0.0, n - 1 - 1e-6)
    # integer clamp too: the 1e-6 margin is below the f32 ulp at n - 1
    j = jnp.minimum(t.astype(jnp.int32), n - 2)
    xy = jnp.stack([x, y], axis=1)
    # transposed column gather (adjacent_pairs docstring: same speed,
    # no 32x-padded [N, 4] temp)
    cols = jnp.concatenate([xy[:-1], xy[1:]], axis=1).T[:, j]
    w = jnp.clip((xq.astype(dt) - cols[0])
                 / (cols[2] - cols[0]), 0.0, 1.0)
    return (1.0 - w) * cols[1] + w * cols[3]


def is_loguniform(x, rtol=1e-8):
    """True when the (concrete, host-side) grid is log-uniform — the
    gate for :func:`loguniform_lerp`'s computed-index path."""
    import numpy as np

    lx = np.log(np.asarray(x))
    d = np.diff(lx)
    return bool(np.allclose(d, d[0], rtol=rtol, atol=1e-12))


def interp_monotone(xq, x, y):
    """``jnp.interp`` on an ascending grid via :func:`bracket_indices`
    (compare-matrix bracketing instead of binary search; same endpoint
    clamping).  Flat intervals (x[j+1] == x[j]) take the left value
    instead of producing 0/0.

    Sized for TABLE-scale query counts (the compare matrix is
    O(queries x grid) transient memory — ~1 M elements at the datagen
    table shapes).  Per-PARTICLE lookups must keep using computed-index
    or paired-gather schemes (pipeline._log_grid_locate, adjacent_pairs
    tables): at 1e7+ queries the matrix would be gigabytes."""
    j = bracket_indices(x, xq)
    x0, x1 = x[j], x[j + 1]
    dx = x1 - x0
    w = jnp.where(dx > 0, (xq - x0) / jnp.where(dx > 0, dx, 1.0), 0.0)
    w = jnp.clip(w, 0.0, 1.0)
    return (1.0 - w) * y[j] + w * y[j + 1]
