"""Eddington-inversion virial equilibrium (reference virial.py:16-236).

TPU-native redesign of the two hottest loops in the reference package
(SURVEY.md §3.3):

* the distribution function g(E) = int_0^sqrt(E) 2 rho'(E - t^2) dt, computed
  in the reference with one adaptive ``scipy.quad`` per radial point behind a
  tqdm bar (virial.py:43-68), becomes an *exact* closed-form Abel integral:
  rho'(psi) is the derivative of a cubic spline — piecewise quadratic — so
  each spline interval's contribution to int_0^E rho'(psi)/sqrt(E-psi) dpsi
  has a polynomial antiderivative after u = sqrt(E-psi).  One fused
  (N_E x N_segments) elementwise+reduce XLA program, zero quadrature error
  (the residual vs the reference is scipy.quad's own default tolerance);

* per-particle velocity rejection sampling, which the reference ships to a
  Cython kernel (``opt.cython_utils.generate_velocities``, setup.py:10-16),
  is replaced by *inverse-CDF table sampling*: the speed CDF
  C(v | psi) ∝ int_0^v u^2 f(psi - u^2/2) du is tabulated on the
  (radial-grid psi) x (quantile) plane once per model, and every particle
  speed is a bilinear lookup — no rejection, no data-dependent loops,
  perfectly shaped for the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import cgparams
from .core.interp import (adjacent_pairs, bracket_indices,
                          cubic_spline, interp_monotone, spline_eval)
from .core.logging import mylog
from .core.scan_ops import cumsum

__all__ = ["VirialEquilibrium", "compute_df", "compute_df_truncated",
           "om_extended_df", "speed_inverse_cdf_table",
           "speed_table_defaults"]


def speed_table_defaults():
    """Shared speed-table builder arguments for BOTH sampling paths (the
    class API and the fused pipeline), from ``cgparams['numerical']`` —
    the two paths must not drift in table resolution or precision."""
    num = cgparams["numerical"]
    return {
        "n_s": int(num["velocity_table_speeds"]),
        "n_q": int(num["velocity_table_quantiles"]),
        "table_dtype": jnp.float32 if num["velocity_table_float32"] else None,
        "nf1": int(num.get("df_node_grid_body", 4096)),
        "nf2": int(num.get("df_node_grid_top", 4096)),
    }


def _safe_sqrt(x):
    """sqrt clamped at 0 with a finite gradient there (double-where): the
    clamped segments contribute exactly 0 to the Abel sums, but a bare
    sqrt(max(x, 0)) still back-propagates inf * 0 = nan through them."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _abel_g_exact(sp, ee):
    """g(E_i) = int_0^{E_i} rho'(psi)/sqrt(E_i - psi) dpsi, exactly.

    Equivalent (via psi = E - t^2) to the reference's
    g(E) = int_0^sqrt(E) 2 rho'(E - t^2) dt (virial.py:54-63).  rho'(psi)
    on spline interval k is b_k + 2 c_k tau + 3 d_k tau^2 (tau = psi - x_k),
    so with u = sqrt(E - psi) the interval contribution is

        G(u) = 2 (k0 u + k2 u^3/3 + k4 u^5/5),   evaluated lo->hi,
        k0 = b + 2cA + 3dA^2,  k2 = -(2c + 6dA),  k4 = 3d,  A = E - x_k.

    The region psi in [0, x_0) below the grid uses interval 0's polynomial
    extrapolated — matching scipy's ext=0 boundary-polynomial behavior the
    reference relies on there.
    """
    x = sp.x
    # segments: [0, x_0] with poly 0 (extrapolated), then [x_k, x_{k+1}]
    lo = jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])
    hi = jnp.concatenate([x[:1], x[1:]])
    xk = jnp.concatenate([x[:1], x[:-1]])
    b = jnp.concatenate([sp.b[:1], sp.b])
    c = jnp.concatenate([sp.c[:1], sp.c])
    d = jnp.concatenate([sp.d[:1], sp.d])

    E = ee[:, None]
    lo_c = jnp.minimum(lo[None, :], E)
    hi_c = jnp.minimum(hi[None, :], E)
    u_lo = _safe_sqrt(E - lo_c)
    u_hi = _safe_sqrt(E - hi_c)
    A = E - xk[None, :]
    k0 = b[None, :] + 2.0 * c[None, :] * A + 3.0 * d[None, :] * A * A
    k2 = -(2.0 * c[None, :] + 6.0 * d[None, :] * A)
    k4 = 3.0 * d[None, :]

    def G(u):
        u2 = u * u
        return 2.0 * u * (k0 + u2 * (k2 / 3.0 + u2 * (k4 / 5.0)))

    return jnp.sum(G(u_lo) - G(u_hi), axis=1)


@jax.jit
def compute_df(ee: jnp.ndarray, pden: jnp.ndarray):
    """Eddington inversion on an ascending relative-potential grid.

    Parameters
    ----------
    ee : (N,) ascending relative potential psi = -Phi, reversed radial grid
        (virial.py:70-72).
    pden : (N,) particle density on the same reversed grid.

    Returns
    -------
    f : (N,) the ergodic DF f(E) evaluated at E = ee, in Msun Myr^3 / kpc^6.

    g(E) is computed *exactly* (closed-form Abel integral of the piecewise-
    quadratic spline derivative, :func:`_abel_g_exact`); the residual vs the
    reference's per-point adaptive quad is scipy's own default tolerance
    (median ~7e-7 in f after spline differentiation; verified against a
    1e-12-tolerance scipy run, tests/test_virial.py).
    """
    dens_sp = cubic_spline(ee, pden)
    g = _abel_g_exact(dens_sp, ee)
    g_sp = cubic_spline(ee, g)
    f = spline_eval(g_sp, ee, nu=1) / (jnp.sqrt(8.0) * jnp.pi**2)
    return f


@partial(jax.jit, static_argnames=("n_ext",))
def om_extended_df(ee, pden, n_ext=192, factor=256.0):
    """Eddington inversion with a power-law continuation of the density
    BELOW the grid's lowest binding energy; returns the EXTENDED grid
    ``(ee_ext, f_ext)`` of length ``n_ext + len(ee)``.

    :func:`compute_df` models rho(psi) on psi in [0, ee[0]) — binding
    energies reachable only beyond the truncation radius — by the
    boundary spline polynomial (matching the reference's scipy ext=0
    behavior).  For densities with nonzero slope at the truncation
    (notably the Osipkov-Merritt augmented rho_Q = (1 + r^2/r_a^2) rho,
    which decays two powers slower than rho), that cubic is a poor
    model and f(Q) degrades toward r_max: the reconstruction residual
    reaches ~36% at the boundary for r_a = 0.15 r_max
    (docs/particles.md, round-4 known limitation).

    This variant prepends ``n_ext`` log-spaced knots on
    [ee[0]/factor, ee[0]) carrying the power-law continuation
    rho(psi) = rho(ee[0]) (psi/ee[0])^m — with m the boundary log-log
    slope — which is EXACT for an outer power-law density under the
    truncated-mass potential psi = G M / r (both are power laws of r
    beyond r_max, so rho is a power law of psi), and inverts on the
    extended grid.

    Consumers MUST spline f over the returned ``ee_ext``, not the
    original knots: the speed tables evaluate f at E = psi (1 - s^2)
    down to E = 0, i.e. BELOW ee[0] for every row near r_max, and the
    virial reconstruction integrates from E = 0 — with the outer DF
    diverging as E^(m - 3/2) when m < 3/2 (common: the canonical
    cluster's rho_Q has m ~ 1.38), a cubic extrapolation of f there is
    wildly wrong (measured residual 7e2 at the boundary when only
    original-knot values are splined).  With the extended grid splined
    end-to-end: boundary residual 36% -> 0.23%, outer-decade p95
    34% -> 0.22%, interior median 1.3e-4 -> 8e-7 on the canonical OM
    cluster (tests/test_anisotropy.py pins the tightened bounds).

    The ergodic product keeps :func:`compute_df` — its boundary slope
    is near zero, the artifact is ~1e-4-level, and the committed
    goldens / reference-parity pins (rtol 1e-7) stay byte-stable.
    """
    mslope = ((jnp.log(pden[1]) - jnp.log(pden[0]))
              / (jnp.log(ee[1]) - jnp.log(ee[0])))
    psi_ext = ee[0] * jnp.exp(
        jnp.linspace(-jnp.log(factor), 0.0, n_ext + 1))[:-1]
    rho_ext = pden[0] * (psi_ext / ee[0]) ** mslope
    ee_ext = jnp.concatenate([psi_ext, ee])
    f_ext = compute_df.__wrapped__(ee_ext,
                                   jnp.concatenate([rho_ext, pden]))
    return ee_ext, f_ext


@partial(jax.jit, static_argnames=("n_ext",))
def compute_df_truncated(ee, pden, n_ext=192, factor=256.0):
    """f of :func:`om_extended_df` at the ORIGINAL knots — the
    catalog/HDF5-facing form (fixed grid length).  Table builders and
    the virial check should use :func:`om_extended_df` directly (see
    its docstring for why)."""
    return om_extended_df.__wrapped__(ee, pden, n_ext=n_ext,
                                      factor=factor)[1][n_ext:]


@jax.jit
def check_virial_density(ee, f_vals):
    """rho(psi_i) = 4 pi int_0^psi_i f(E) sqrt(2 (psi_i - E)) dE, exactly.

    Substituting E = psi - u^2: rho = 8 sqrt(2) pi int_0^sqrt(psi)
    u^2 f(psi - u^2) du.  f on spline interval k is cubic in
    tau = E - x_k = A - u^2 (A = psi - x_k), so the integrand is an exact
    polynomial in u per interval — closed-form antiderivative, no
    quadrature (reference virial.py:78-106 uses per-point adaptive quad).
    """
    sp = cubic_spline(ee, f_vals)
    x = sp.x
    lo = jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])
    hi = jnp.concatenate([x[:1], x[1:]])
    xk = jnp.concatenate([x[:1], x[:-1]])
    a = jnp.concatenate([sp.a[:1], sp.a])
    b = jnp.concatenate([sp.b[:1], sp.b])
    c = jnp.concatenate([sp.c[:1], sp.c])
    d = jnp.concatenate([sp.d[:1], sp.d])

    psi = ee[:, None]
    lo_c = jnp.minimum(lo[None, :], psi)
    hi_c = jnp.minimum(hi[None, :], psi)
    # u decreases as E increases: E=lo -> u_hi, E=hi -> u_lo
    u_at_lo = _safe_sqrt(psi - lo_c)
    u_at_hi = _safe_sqrt(psi - hi_c)
    A = psi - xk[None, :]
    m0 = a[None, :] + A * (b[None, :] + A * (c[None, :] + A * d[None, :]))
    m2 = -(b[None, :] + A * (2.0 * c[None, :] + 3.0 * A * d[None, :]))
    m4 = c[None, :] + 3.0 * A * d[None, :]
    m6 = -d[None, :]

    def F(u):
        u2 = u * u
        return u2 * u * (m0 / 3.0 + u2 * (m2 / 5.0 + u2 * (m4 / 7.0
                                                           + u2 * m6 / 9.0)))

    rho = 8.0 * jnp.sqrt(2.0) * jnp.pi * jnp.sum(F(u_at_lo) - F(u_at_hi),
                                                 axis=1)
    return rho


@partial(jax.jit, static_argnames=("n_s", "n_q", "table_dtype", "use_pallas",
                                   "nf1", "nf2"))
def speed_inverse_cdf_table(ee, f_vals, n_s: int = 1024, n_q: int = 512,
                            table_dtype=None, use_pallas: bool = False,
                            row_ee=None, nf1: int = 4096, nf2: int = 4096):
    """Tabulated inverse speed-CDF for every psi on the grid.

    For each psi_j: with v = v_esc s, s in [0,1], v_esc = sqrt(2 psi_j),
    pdf(s) ∝ s^2 f(psi_j (1 - s^2)).  Returns ``s_inv`` of shape
    (N, n_q): s_inv[j, m] is the speed fraction at quantile m/(n_q-1).

    ``table_dtype`` controls the cumulative/inversion precision: the f(E)
    spline is always evaluated at input precision, but the (N x n_s)
    cumulative sum and quantile inversion can run in float32 — a ~10x saving
    on TPU where f64 matmuls are emulated — with quantile error ~1e-7,
    negligible against the 1/n_q table resolution.  ``use_pallas`` routes
    the inversion through the gather-free Pallas kernel
    (ops/pallas_kernels.invert_cdf_rows).

    ``row_ee``: optional energies for the table ROWS (default: one row per
    ``ee`` entry).  The f(E) spline always uses the full (ee, f_vals) grid;
    a coarser row grid shrinks the O(rows x n_s) accumulation/inversion —
    consumers that interpolate between rows anyway (the pipeline's joint
    speed table) lose no accuracy they weren't already giving up.
    """
    f_sp = cubic_spline(ee, f_vals)
    if row_ee is None:
        row_ee = ee
    s = jnp.linspace(0.0, 1.0, n_s)
    E = row_ee[:, None] * (1.0 - s[None, :] ** 2)  # (rows, n_s)
    if table_dtype is not None:
        # evaluate f(E) at the (rows x n_s) query block in reduced
        # precision THROUGH an energy node table: the exact f64 cubic
        # spline is evaluated once at the nodes, and the block queries
        # become computed-index lerps (one row-of-2 gather each) instead
        # of per-query cubic searches — the table build was gather-bound
        # in those searches (~20 ms/halo on v5e; this route cuts the
        # gather count ~7x).  The pdf only shapes a CDF that is
        # re-normalized row-wise.  Node placement is TWO uniform
        # segments: NF1 nodes over [0, 0.9 e_max) and NF2 over the top
        # decade [0.9 e_max, e_max], where f(E) rises steeply (cluster
        # centers) — effective top resolution e_max/41k at 8192 total
        # node evals.  Measured vs the exact-f64 path: worst row 1.9e-3,
        # p99 1.4e-4 of v_esc (uniform 4096 left 4.8e-2; uniform 16384
        # reached 2.3e-3 AND doubled the node-eval cost, cfg5b 7.3 -> 11.2 s).
        # Scale into f32 range first (f ~ 1e12 in galactic DF units).
        # Node counts are cgparams["numerical"]["df_node_grid_{body,top}"]
        # knobs threaded through speed_table_defaults(); the drawn-ensemble
        # sigma_v(r)-vs-Jeans test (tests/test_sampling.py) pins the
        # resulting observable error across a randomized (M200, c) sweep.
        NF1, NF2 = nf1, nf2
        fmax = jnp.max(jnp.abs(f_vals))
        e_max = jnp.max(row_ee)
        b = 0.9 * e_max
        # per-segment node evaluation WITHOUT per-node binary searches:
        # the nodes are uniform, so each segment is a scatter+cumsum
        # bracketing + one row-of-5 gather per node
        # (core/interp.spline_eval_uniform; bit-identical to the
        # spline_eval route, ~14x fewer gather ops — the node eval was
        # the datagen batch program's table-overhead hot spot)
        from .core.interp import spline_eval_uniform

        if NF1 < 2 or NF2 < 2:
            raise ValueError(
                f"df node grids need >= 2 nodes per segment (got "
                f"nf1={NF1}, nf2={NF2}); NF2=1 would divide by zero and "
                "poison the whole speed table with NaNs")
        step1 = b / NF1
        step2 = (e_max - b) / (NF2 - 1)
        fu = jnp.concatenate([
            spline_eval_uniform(f_sp, jnp.zeros_like(b), step1, NF1),
            spline_eval_uniform(f_sp, b, step2, NF2)])
        fu = jnp.maximum(fu / fmax, 0.0)
        f_pairs = adjacent_pairs(fu.astype(table_dtype))
        s = s.astype(table_dtype)
        E = E.astype(table_dtype)
        Ef = E.reshape(-1)
        bt = b.astype(table_dtype)
        # segment 1: interval k covers [k, k+1) * b/NF1; the seam
        # interval (k = NF1-1) ends exactly at b = the first seg-2 node,
        # so adjacent_pairs over the concatenated nodes stays valid
        x1 = jnp.clip(Ef / bt * NF1, 0.0, NF1 - 1e-4)
        k1 = jnp.minimum(x1.astype(jnp.int32), NF1 - 1)
        w1 = x1 - k1.astype(table_dtype)
        x2 = jnp.clip((Ef - bt) / (e_max.astype(table_dtype) - bt)
                      * (NF2 - 1), 0.0, NF2 - 1 - 1e-4)
        k2 = jnp.minimum(x2.astype(jnp.int32), NF2 - 2)
        w2 = x2 - k2.astype(table_dtype)
        in1 = Ef < bt
        k = jnp.where(in1, k1, NF1 + k2)
        w = jnp.where(in1, w1, w2)
        fp = f_pairs[k]
        f_E = ((1.0 - w) * fp[:, 0] + w * fp[:, 1]).reshape(E.shape)
        pdf = s[None, :] ** 2 * f_E
        pdf = pdf / jnp.maximum(jnp.max(pdf, axis=1, keepdims=True),
                                jnp.asarray(1e-30, table_dtype))
    else:
        pdf = s[None, :] ** 2 * jnp.maximum(
            spline_eval(f_sp, E.reshape(-1)).reshape(E.shape), 0.0)
    ds = s[1] - s[0]
    cdf = jnp.concatenate(
        [jnp.zeros((pdf.shape[0], 1), pdf.dtype),
         cumsum(0.5 * (pdf[:, 1:] + pdf[:, :-1]) * ds, axis=1)], axis=1)
    total = cdf[:, -1:]
    cdf = cdf / jnp.where(total > 0.0, total, 1.0)
    # enforce strict monotonicity for clean inversion
    eps_val = 1e-12 if cdf.dtype == jnp.float64 else 1e-7
    eps = jnp.arange(n_s, dtype=cdf.dtype) * eps_val
    cdf = cdf + eps[None, :]
    cdf = cdf / cdf[:, -1:]

    if use_pallas:
        from .ops.pallas_kernels import invert_cdf_rows

        return invert_cdf_rows(cdf, n_q=n_q)
    if table_dtype is not None and jax.default_backend() == "tpu":
        # fused masked-reduction inversion: 5x faster than the vmapped
        # binary-search interp on TPU at these table sizes (bit-equivalent);
        # on CPU the O(n_q x n_s) streaming loses to binary search, so the
        # route is picked per backend.
        return _invert_cdf_masked(cdf, s, n_q)
    q = jnp.linspace(0.0, 1.0, n_q).astype(cdf.dtype)
    s_inv = jax.vmap(lambda c: jnp.interp(q, c, s))(cdf)
    return s_inv


@partial(jax.jit, static_argnames=("n_q",))
def _invert_cdf_masked(cdf, s, n_q: int):
    """CDF inversion as a fused masked reduction (no binary searches):

        s_inv[j, m] = sum_k [c_jk <= q_m < c_jk+1] *
                      (s_k + (q_m - c_jk) ds / (c_jk+1 - c_jk))

    XLA streams the (N, n_q, n_s) mask through the VPU without
    materializing it; benchmarked as an alternative to the vmapped-interp
    route (which does n_q binary searches per row)."""
    n_s = cdf.shape[1]
    ds = s[1] - s[0]
    q = jnp.linspace(0.0, 1.0, n_q).astype(cdf.dtype)[None, :, None]
    c_lo = cdf[:, None, :-1]
    c_hi = cdf[:, None, 1:]
    last = jnp.arange(n_s - 1) == (n_s - 2)
    mask = (c_lo <= q) & ((q < c_hi) | last[None, None, :])
    val = jnp.where(mask,
                    s[None, None, :-1] + (q - c_lo) * ds / (c_hi - c_lo),
                    0.0)
    return val.sum(axis=2)


@partial(jax.jit, static_argnames=())
def sample_speeds(radius, psi_p, ee, s_inv, key):
    """Bilinear inverse-CDF speed sampling for every particle.

    radius/psi_p: (Np,) particle radii and relative potentials;
    ee: (N,) ascending psi grid; s_inv: (N, n_q) inverse-CDF table.
    Returns speeds in kpc/Myr.

    The four bilinear corners come back as TWO row-of-2 gathers from the
    quantile-paired table (plus one for the bracketing ``ee`` pair) — on
    TPU a contiguous row gather costs ~2.7x less than one scalar gather
    and 2D ``(j, m)`` indexing carries a further +35%
    (scripts/tpu_gather_experiments2.py); the math is the identical
    deterministic bilinear lerp.
    """
    n, n_q = s_inv.shape
    u = jax.random.uniform(key, radius.shape, dtype=s_inv.dtype)

    j = jnp.clip(jnp.searchsorted(ee, psi_p, side="right") - 1, 0, n - 2)
    e_pair = adjacent_pairs(ee)[j]                        # row gather
    wj = (psi_p - e_pair[:, 0]) / (e_pair[:, 1] - e_pair[:, 0])
    wj = jnp.clip(wj, 0.0, 1.0).astype(s_inv.dtype)

    qpos = u * (n_q - 1)
    m = jnp.clip(qpos.astype(jnp.int32), 0, n_q - 2)
    wm = qpos - m

    pairs = adjacent_pairs(s_inv).reshape(-1, 2)          # (n*(n_q-1), 2)
    flat = j * (n_q - 1) + m
    lo = pairs[flat]                                      # row gather
    hi = pairs[flat + (n_q - 1)]                          # row gather
    s = (1.0 - wj) * ((1.0 - wm) * lo[:, 0] + wm * lo[:, 1]) \
        + wj * ((1.0 - wm) * hi[:, 0] + wm * hi[:, 1])
    v_esc = jnp.sqrt(2.0 * psi_p)
    return s * v_esc


def build_joint_speed_pairs(rr, psi_grid, row_ee, s_inv, r_q,
                            dtype=jnp.float32, psi_q=None):
    """Joint ABSOLUTE-speed pair table at radius-quantile nodes.

    Folds the (n_rows, n_q) inverse speed-fraction table ``s_inv`` (rows
    at energies ``row_ee``, ascending) onto the radius-quantile nodes
    ``r_q`` and multiplies by v_esc = sqrt(2 psi): a particle's speed draw
    then needs no psi lookup at all — just its radius-quantile row and a
    quantile column (the pipeline's draw design, pipeline.py:167-236,
    generalized to arbitrary ``row_ee`` grids).  Returns
    ``(RQ*(n_q-1), 2)`` quantile-paired rows for row-of-2 gathers.
    O(RQ x n_q) one-time work — trivial against the O(N) draws.
    """
    if psi_q is None:
        psi_q = interp_monotone(r_q, rr, psi_grid)
    n_rows, n_q = s_inv.shape
    # compare-matrix bracketing: vmapped searchsorted was a dominant
    # table-build stage on TPU (r4_cfg5b_stages.log)
    j = bracket_indices(row_ee, psi_q)
    w = (psi_q - row_ee[j]) / (row_ee[j + 1] - row_ee[j])
    w = jnp.clip(w, 0.0, 1.0).astype(dtype)
    srow = _banded_row_lerp(s_inv.astype(dtype), j, w)
    joint = srow * jnp.sqrt(2.0 * psi_q).astype(dtype)[:, None]
    return adjacent_pairs(joint).reshape(-1, 2)


def _banded_row_lerp(sd, j, w):
    """Row interpolation ``(1-w) sd[j] + w sd[j+1]`` as a banded-weight
    matmul instead of two wide-row gathers.

    At production shapes the gather form moves rq x n_q x 2 table
    elements through TPU's issue-bound gather path (~2.1 s of the
    1024-cluster datagen batch, benchmarks/measurements_r4/
    r4_cfg5b_attr.log: the joint fold was the single largest table
    stage).  The same lerp is exactly a 2-banded interpolation matrix
    W (rq, n_rows) — one-hot bands carrying (1-w, w) at columns
    (j, j+1) — applied as W @ sd: rq x n_rows x n_q MACs on the MXU at
    HIGHEST precision (f32-accurate; the ~n_rows-2 zero terms per row
    add nothing), which is orders cheaper than the gathers.
    """
    n_rows = sd.shape[0]
    k = jnp.arange(n_rows, dtype=jnp.int32)
    # exact one-hot bands (a fractional-position hat max(0, 1-|pos-k|)
    # loses ~ulp(n_rows) of w to the index subtraction)
    W = (jnp.where(k[None, :] == j[:, None], 1.0 - w[:, None], 0.0)
         + jnp.where(k[None, :] == j[:, None] + 1, w[:, None], 0.0)
         ).astype(sd.dtype)
    return jax.lax.dot(W, sd, precision=jax.lax.Precision.HIGHEST)


def sample_speeds_joint(joint_pairs, n_q, kq, wq, key):
    """Speed draw from a joint pair table: ONE row-of-2 gather/particle.

    ``kq``/``wq``: the particle's radius-quantile index and fractional
    weight (from the radius draw).  The table row is picked stochastically
    between the two nodes bracketing the radius (Bernoulli on ``wq``),
    preserving the conditional speed distribution to the table's O(1/RQ)
    resolution — the same scheme the fused pipeline uses
    (pipeline.py:199-236, measured 5.7x over the 8-scalar-gather draw).
    """
    dtype = joint_pairs.dtype
    kv, kb = jax.random.split(key)
    uq = jax.random.uniform(kv, kq.shape, dtype=dtype)
    qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
    # integer clamp: in f32 the 1e-6 margin is below the ulp at n_q - 1,
    # so qm can round to exactly n_q - 1 and the row index would spill
    # into the next radius row of the flattened pair table
    m = jnp.minimum(qm.astype(jnp.int32), n_q - 2)
    wm = qm - m.astype(dtype)
    bern = jax.random.uniform(kb, kq.shape, dtype=dtype) < wq.astype(dtype)
    k_row = kq + bern.astype(jnp.int32)
    # transposed column gather (core/interp.adjacent_pairs docstring:
    # same speed, no 64x-padded [N, 2] temp)
    from .core.interp import pair_col_lerp

    return pair_col_lerp(joint_pairs, k_row * (n_q - 1) + m, wm)


class VirialEquilibrium:
    """Virial equilibrium model for a collisionless component
    (reference virial.py:16-236).

    ``r_a``: Osipkov-Merritt anisotropy radius (kpc).  ``None`` (default)
    is the reference's ergodic/isotropic model.  A finite ``r_a`` builds
    the OM distribution function f(Q), Q = E - L^2/(2 r_a^2) — radially
    anisotropic with beta(r) = r^2 / (r^2 + r_a^2) (isotropic inside
    r_a, radial outside) — a capability the reference lacks.  The OM
    inversion is the SAME Abel integral with the augmented density
    rho_Q(r) = (1 + r^2/r_a^2) rho(r) in place of rho (Binney & Tremaine
    eq. 4.67), so every downstream table/draw path is reused verbatim;
    only the velocity DIRECTIONS change at sample time
    (sampling.generate_collisionless_particles divides the tangential
    components by gamma(r) = sqrt(1 + r^2/r_a^2))."""

    def __init__(self, model, ptype: str = "dark_matter", df=None,
                 r_a=None):
        self.num_elements = model.num_elements
        self.ptype = ptype
        self.model = model
        self.r_a = None if r_a is None else float(r_a)
        if self.r_a is not None and self.r_a <= 0:
            raise ValueError(f"r_a must be positive, got {r_a}")
        if df is None:
            self._generate_df()
        else:
            self.df = np.asarray(df, dtype=np.float64)
        self._s_inv = None

    # ------------------------------------------------------------ DF build
    @property
    def ee(self):
        """Ascending relative potential grid (virial.py:70-72)."""
        return -np.asarray(self.model["gravitational_potential"])[::-1]

    @property
    def ff(self):
        """f(E) on the ascending ee grid (virial.py:74-76)."""
        return np.asarray(self.df)[::-1]

    def _augmented_density(self):
        """rho (isotropic) or the OM rho_Q = (1 + r^2/r_a^2) rho, in
        radial ordering."""
        pden = np.asarray(self.model[f"{self.ptype}_density"])
        if self.r_a is None:
            return pden
        rr = np.asarray(self.model["radius"])
        return pden * (1.0 + (rr / self.r_a) ** 2)

    @property
    def _df_grid(self):
        """``(ee_spline, f_spline)`` — the grid consumers spline f(E)
        over.  Ergodic: the model grid.  OM: the power-law-extended grid
        (:func:`om_extended_df` docstring — speed tables and the virial
        reconstruction query E BELOW ee[0]); rebuilt lazily from the
        density when the DF came from an HDF5 resume."""
        if self.r_a is None:
            return jnp.asarray(self.ee), jnp.asarray(self.ff)
        if getattr(self, "_ext", None) is None:
            pden = self._augmented_density()[::-1]
            self._ext = om_extended_df(jnp.asarray(self.ee),
                                       jnp.asarray(pden))
        return self._ext

    def _generate_df(self):
        mylog.info("Computing the %s particle DF%s.", self.ptype,
                   "" if self.r_a is None
                   else f" (Osipkov-Merritt, r_a={self.r_a:g} kpc)")
        if self.r_a is None:
            pden = self._augmented_density()[::-1]
            f = compute_df(jnp.asarray(self.ee), jnp.asarray(pden))
        else:
            # OM: rho_Q's nonzero boundary slope needs the power-law
            # below-grid continuation (om_extended_df docstring)
            self._ext = None
            ee_ext, f_ext = self._df_grid
            f = f_ext[ee_ext.shape[0] - self.ee.shape[0]:]
        # stored reversed (radially increasing), like the reference's df
        self.df = np.asarray(f)[::-1]
        fmin = float(self.df.min())
        if self.r_a is not None and fmin < -1e-12 * float(self.df.max()):
            mylog.warning(
                "The Osipkov-Merritt f(Q) for r_a=%g goes negative "
                "(min %g): the model cannot support this much radial "
                "anisotropy — increase r_a.", self.r_a, fmin)

    def check_virial(self):
        """(rho_from_df, relative error) — virial.py:78-106.

        For an OM model the isotropic-form reconstruction integral
        returns the AUGMENTED density, so the residual is taken against
        rho_Q — the same self-consistency statement (reconstructed on
        the extended grid, reported at the model knots)."""
        ee_sp, ff_sp = self._df_grid
        rho_full = np.asarray(check_virial_density(ee_sp, ff_sp))
        rho = rho_full[rho_full.shape[0] - self.ee.shape[0]:]
        pden = self._augmented_density()
        chk = (rho[::-1] - pden) / pden
        mylog.info("The maximum relative deviation of this profile from "
                   "virial equilibrium is %g", np.abs(chk).max())
        return rho[::-1], chk

    # ----------------------------------------------------------- sampling
    def _speed_table(self, n_rows: int = 256):
        """(row_ee, s_inv): the inverse speed-CDF table on an
        ``n_rows``-point subsample of the energy grid (the f(E) spline
        still uses every grid point; rows are bilinearly interpolated at
        sample time, so coarse rows cost ~1e-4 — same trade as the
        pipeline's ``build_speed_tables``)."""
        if not isinstance(self._s_inv, dict):
            self._s_inv = {}
        if n_rows not in self._s_inv:  # cache keyed on resolution
            ee = self.ee
            idx = np.unique(np.round(
                np.linspace(0, ee.size - 1,
                            min(n_rows, ee.size))).astype(int))
            row_ee = jnp.asarray(ee[idx])
            # rows live on the MODEL grid; the f(E) spline uses _df_grid
            # (OM: the extended grid — rows near r_max query E below
            # ee[0], om_extended_df docstring)
            ee_sp, ff_sp = self._df_grid
            self._s_inv[n_rows] = (row_ee, speed_inverse_cdf_table(
                ee_sp, ff_sp, row_ee=row_ee, **speed_table_defaults()))
        return self._s_inv[n_rows]

    def generate_particles(self, num_particles, r_max=None, sub_sample=1,
                           compute_potential=False, prng=None):
        """Sample positions (inverse-CDF of the mass profile) and speeds
        (inverse-CDF of the Eddington DF), with isotropic angles
        (virial.py:108-236)."""
        from .sampling import generate_collisionless_particles

        return generate_collisionless_particles(
            self, num_particles, r_max=r_max, sub_sample=sub_sample,
            compute_potential=compute_potential, prng=prng)
