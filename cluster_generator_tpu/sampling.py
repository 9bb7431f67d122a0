"""On-device particle sampling with ``jax.random``.

Replaces the reference's NumPy-RandomState sampling paths
(utils.py:154-166 ``generate_particle_radii``, model.py:766-947 gas/tracer
generators, virial.py:108-236 collisionless generator + Cython velocity
kernel).  All draws are inverse-CDF transforms with static shapes:

* radii: u ~ U(0,1) mapped through the normalized enclosed-mass CDF
  (``jnp.interp`` — a single fused gather);
* angles: isotropic (cos(theta) ~ U(-1,1), phi ~ U(0, 2 pi));
* speeds: bilinear lookup in the per-model inverse speed-CDF table
  (virial.py:speed_inverse_cdf_table) — no rejection loop at all.

PRNG reproducibility note (SURVEY.md §4): the reference's MT19937 streams
cannot be replicated with jax.random by design; tests compare sampled
ensembles by distribution (KS tests) rather than bitwise.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.interp import cubic_spline, spline_eval
from .core.logging import mylog
from .particles import ClusterParticles

__all__ = ["parse_prng", "generate_particle_radii", "generate_gas_particles",
           "generate_tracer_particles", "generate_collisionless_particles"]


def parse_prng(prng):
    """Coerce None / int / jax key into a jax PRNG key (utils.py:184-188)."""
    if prng is None:
        import secrets

        return jax.random.key(secrets.randbits(63))
    if isinstance(prng, (int, np.integer)):
        return jax.random.key(int(prng))
    if isinstance(prng, np.random.RandomState):
        # accept the reference's RandomState for API compatibility; fold its
        # state into a seed
        return jax.random.key(int(prng.randint(0, 2**31 - 1)))
    return prng  # assume a jax key


def _truncated_cdf(r, m, dens=None, r_max=None):
    """Host-side CDF prep: normalized enclosed mass, truncated at r_max.

    Zero-density grid points (e.g. the clamped dark-matter outskirts,
    model.py:252-253) are masked by forward-filling the mass so they carry
    zero sampling probability — the static-shape equivalent of the
    reference's ``nonzero`` row masking (virial.py:161-168).
    Returns (P, r_with_zero, mtot).
    """
    r = np.asarray(r, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    if dens is not None:
        dens = np.asarray(dens)
        m_eff = np.where(dens > 0.0, m, -np.inf)
        m_eff = np.maximum.accumulate(m_eff)
        m_eff = np.where(np.isfinite(m_eff), m_eff, 0.0)
    else:
        m_eff = m
    if r_max is None:
        ridx = r.size
    else:
        ridx = int(np.searchsorted(r, r_max))
        if ridx == 0:
            # ridx-1 would wrap to the LAST grid point, silently using the
            # full-grid mass and sampling far beyond r_max (latent in the
            # reference too, utils.py:154-166)
            raise ValueError(
                f"r_max={r_max} lies below the first grid point "
                f"(r[0]={r[0]}); nothing to sample.")
    mtot = m_eff[ridx - 1]
    P = np.clip(m_eff / mtot, 0.0, 1.0)
    P = np.maximum.accumulate(P)
    P = np.insert(P, 0, 0.0)
    rr = np.insert(r, 0, 0.0)
    return P, rr, float(mtot)


@partial(jax.jit, static_argnames=("num",))
def _sample_radii_device(key, P, rr, num):
    u = jax.random.uniform(key, (num,), dtype=jnp.float64)
    return jnp.interp(u, P, rr)


# Radius-quantile table resolution for the generator fast paths: draws
# become a computed-index lerp (no per-particle binary search over the
# CDF — measured 3x cheaper at 1e6 f64 draws, scripts/
# tpu_r3_cfg2_ablation.py C3) at O(1/RQ^2) CDF resampling error
# (KS D ~ 6e-5 vs the exact per-particle interp).
_RQ_CLASS = 4096


def _radius_quantile_pairs(P, rr):
    """(RQ-1, 2) adjacent-pair table of the inverse CDF at uniform
    quantiles — exact ``jnp.interp`` evaluated ONCE at the nodes.

    The top node must be clamped at the radius where P first reaches 1:
    the r_max clip leaves a P=1 plateau out to the grid end, and interp
    at exactly 1.0 walks to the plateau's far edge — draws would leak
    past the truncation radius (the same trap pipeline.build_radius_tables
    clamps, pipeline.py:110-113)."""
    from .core.interp import adjacent_pairs

    P = np.asarray(P)
    hits = np.flatnonzero(P >= 1.0)
    # _truncated_cdf guarantees an exact 1.0 in P; if a future caller
    # passes a CDF topping out below 1, argmax-style indexing would pick
    # index 0 and silently clamp every radius to rr[0] — fall back to the
    # grid end instead so the failure mode is a loose cap, not a collapse
    r_cap = np.asarray(rr)[int(hits[0])] if hits.size else np.asarray(rr)[-1]
    q = jnp.linspace(0.0, 1.0, _RQ_CLASS)
    r_q = jnp.minimum(jnp.interp(q, jnp.asarray(P), jnp.asarray(rr)), r_cap)
    return adjacent_pairs(r_q)


@partial(jax.jit, static_argnames=("num",))
def _sample_radii_table(key, r_pair, num):
    """radius + (kq, wq): computed-index lerp on the quantile-pair table.

    kq/wq feed the joint speed table (virial.sample_speeds_joint) and any
    per-particle node-value lerp, so downstream lookups share the single
    radius draw."""
    RQ = r_pair.shape[0] + 1
    u = jax.random.uniform(key, (num,), dtype=jnp.float64)
    x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-9)
    kq = x.astype(jnp.int32)
    wq = x - kq
    from .core.interp import pair_col_lerp

    return pair_col_lerp(r_pair, kq, wq), kq, wq


@partial(jax.jit, static_argnames=())
def _node_value_lerp(pairs, kq, wq):
    """Per-particle lerp of a quantile-node value table (one transposed
    column gather; core/interp.adjacent_pairs docstring)."""
    from .core.interp import pair_col_lerp

    return pair_col_lerp(pairs, kq, wq)


def generate_particle_radii(r, m, num_particles, r_max=None, prng=None,
                            dens=None):
    """Inverse-CDF radius sampling (utils.py:154-166).

    Returns (radii, mtot) like the reference."""
    key = parse_prng(prng)
    P, rr, mtot = _truncated_cdf(r, m, dens=dens, r_max=r_max)
    radius = _sample_radii_device(key, jnp.asarray(P), jnp.asarray(rr),
                                  int(num_particles))
    return radius, mtot


@partial(jax.jit, static_argnames=("num",))
def _isotropic_units(key, num):
    k1, k2 = jax.random.split(key)
    cos_t = jax.random.uniform(k1, (num,), minval=-1.0, maxval=1.0,
                               dtype=jnp.float64)
    phi = 2.0 * jnp.pi * jax.random.uniform(k2, (num,), dtype=jnp.float64)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                     axis=-1)


def _tile(arr, sub_sample, num):
    if sub_sample > 1:
        # num may not divide sub_sample: tile one extra copy so the
        # truncation always has >= num elements (num_sub = num//sub_sample
        # rounds down; without the +1 a 10-particle sub_sample=3 draw
        # yielded 9 and crashed downstream broadcasting)
        return jnp.tile(arr, sub_sample + 1)[:num]
    return arr


def generate_tracer_particles(model, num_particles, r_max=None, sub_sample=1,
                              prng=None):
    """Massless tracers following the gas (model.py:766-836)."""
    key = parse_prng(prng)
    k_r, k_ang = jax.random.split(key)
    mylog.info("We will be assigning %d tracer particles.", num_particles)
    num_sub = num_particles // sub_sample
    P, rr_ins, _ = _truncated_cdf(model["radius"], model["gas_mass"],
                                  r_max=r_max)
    radius_sub, _, _ = _sample_radii_table(k_r, _radius_quantile_pairs(
        P, rr_ins), num_sub)
    radius = _tile(radius_sub, sub_sample, num_particles)
    pos = radius[:, None] * _isotropic_units(k_ang, num_particles)

    fields = OrderedDict()
    fields["tracer", "particle_position"] = np.asarray(pos)
    fields["tracer", "particle_velocity"] = np.zeros((num_particles, 3))
    fields["tracer", "particle_mass"] = np.zeros(num_particles)
    return ClusterParticles("tracer", fields)


def generate_gas_particles(model, num_particles, r_max=None, sub_sample=1,
                           compute_potential=False, prng=None):
    """Gas particles in HSE: positions from the gas-mass CDF, thermal
    energies e = 1.5 P / rho interpolated at each radius, equal masses,
    zero velocities (model.py:838-947)."""
    key = parse_prng(prng)
    k_r, k_ang = jax.random.split(key)
    mylog.info("We will be assigning %d gas particles.", num_particles)
    num_sub = num_particles // sub_sample

    P, rr_ins, mtot = _truncated_cdf(model["radius"], model["gas_mass"],
                                     r_max=r_max)
    r_pair = _radius_quantile_pairs(P, rr_ins)
    radius_sub, kq, wq = _sample_radii_table(k_r, r_pair, num_sub)
    radius = _tile(radius_sub, sub_sample, num_particles)
    pos = radius[:, None] * _isotropic_units(k_ang, num_particles)

    # field values at the DRAWN radii (the reference splines at each
    # particle radius, model.py:908-916).  Lerping field values between
    # the radius-quantile nodes instead (sharing the draw's (kq, wq))
    # is exact for the radius but NOT for a curved field: the innermost
    # mass-quantile bin spans a huge radius range and 1.5 P/rho across
    # it is off by up to ~60% (core/interp.loguniform_lerp docstring).
    # Log-uniform grids (every built model) take the computed-index
    # row-gather path (cubic-exact, no search); arbitrary grids fall
    # back to searched spline evaluation.
    from .core.interp import (bracket_for_spline, is_loguniform,
                              spline_eval_at, spline_eval_loguniform)

    rgrid = jnp.asarray(model["radius"])
    if is_loguniform(model["radius"]):
        field_at = lambda arr: spline_eval_loguniform(
            cubic_spline(rgrid, jnp.asarray(arr)), radius_sub)
    else:
        # arbitrary grids: ONE per-particle bracketing search shared by
        # every field (the knots are the same), then row gathers — not
        # a fresh searchsorted per field.  Queries are clamped to the
        # knot range like the log-uniform path: the sampling CDF starts
        # at r = 0, so inner-bin draws land BELOW rr[0], where the
        # boundary-polynomial extrapolation can turn 1.5 P/rho negative
        # (observed: e = -21 at r = 0.56 rr[0]).
        r_clamped = jnp.clip(radius_sub, rgrid[0], rgrid[-1])
        idx = bracket_for_spline(rgrid, r_clamped)
        field_at = lambda arr: spline_eval_at(
            cubic_spline(rgrid, jnp.asarray(arr)), r_clamped, idx)
    e_arr = 1.5 * jnp.asarray(model["pressure"]) / jnp.asarray(model["density"])
    energy = _tile(field_at(e_arr), sub_sample, num_particles)
    density = _tile(field_at(model["density"]), sub_sample, num_particles)

    fields = OrderedDict()
    fields["gas", "particle_position"] = np.asarray(pos)
    fields["gas", "thermal_energy"] = np.asarray(energy)
    fields["gas", "particle_mass"] = np.full(num_particles,
                                             mtot / num_particles)
    fields["gas", "density"] = np.asarray(density)
    fields["gas", "particle_velocity"] = np.zeros((num_particles, 3))
    if compute_potential:
        fields["gas", "particle_potential"] = np.asarray(_tile(
            field_at(model["gravitational_potential"]), sub_sample,
            num_particles))
    return ClusterParticles("gas", fields)


def generate_collisionless_particles(virial, num_particles, r_max=None,
                                     sub_sample=1, compute_potential=False,
                                     prng=None):
    """DM/star particles in virial equilibrium (virial.py:108-236).

    Speeds come from the inverse speed-CDF table — the TPU replacement for
    the reference's Cython rejection loop (opt.cython_utils
    .generate_velocities, SURVEY.md §2.2) — folded onto the radius
    quantile nodes as a joint absolute-speed table
    (virial.build_joint_speed_pairs): per particle, one computed-index
    radius lerp + one joint-table row gather, no psi lookup or binary
    search anywhere.

    When ``virial`` carries an Osipkov-Merritt anisotropy radius
    (``VirialEquilibrium(..., r_a=...)``), the same speed draw applies —
    the OM f(Q) is isotropic in (v_r, gamma v_t)-space — and only the
    velocity directions change (tangential components divided by
    gamma(r) = sqrt(1 + r^2/r_a^2)), yielding
    beta(r) = r^2/(r^2 + r_a^2)."""
    from .core.interp import adjacent_pairs
    from .virial import build_joint_speed_pairs, sample_speeds_joint

    model = virial.model
    ptype = virial.ptype
    key = parse_prng(prng)
    k_r, k_ang, k_v, k_vang = jax.random.split(key, 4)
    short = {"dark_matter": "dm", "stellar": "star"}[ptype]
    mylog.info("We will be assigning %d %s particles.", num_particles, ptype)
    num_sub = num_particles // sub_sample

    P, rr_ins, mtot = _truncated_cdf(model["radius"], model[f"{ptype}_mass"],
                                     dens=model[f"{ptype}_density"],
                                     r_max=r_max)
    r_pair = _radius_quantile_pairs(P, rr_ins)
    radius_sub, kq, wq = _sample_radii_table(k_r, r_pair, num_sub)
    radius = _tile(radius_sub, sub_sample, num_particles)
    rhat = _isotropic_units(k_ang, num_particles)
    pos = radius[:, None] * rhat

    # psi at the quantile nodes (exact cubic spline, one-time) feeds the
    # joint absolute-speed table and the per-particle potential
    rgrid = jnp.asarray(model["radius"])
    psi_grid = jnp.asarray(virial.ee)[::-1]  # back to radial ordering
    r_nodes = jnp.concatenate([r_pair[:, 0], r_pair[-1:, 1]])
    psi_nodes = spline_eval(cubic_spline(rgrid, psi_grid), r_nodes)
    psi_p = _node_value_lerp(adjacent_pairs(psi_nodes), kq, wq)

    row_ee, s_inv = virial._speed_table()
    joint_pairs = build_joint_speed_pairs(rgrid, psi_grid, row_ee, s_inv,
                                          r_nodes, dtype=s_inv.dtype,
                                          psi_q=psi_nodes)
    speed_sub = sample_speeds_joint(joint_pairs, s_inv.shape[1],
                                    kq, wq, k_v)
    # the joint table picks the speed row by Bernoulli between the two
    # radius-quantile nodes while the radius is lerped, so a particle near
    # the outer node can draw from the inner node's (faster) table and
    # exceed its LOCAL escape speed by up to the inter-node v_esc
    # difference, O(1/RQ).  Cap at v_esc(r) = sqrt(2 psi(r)) using the
    # already-computed psi_p so no particle leaves unbound.
    speed_sub = jnp.minimum(speed_sub,
                            jnp.sqrt(2.0 * psi_p).astype(speed_sub.dtype))
    speed = _tile(speed_sub, sub_sample, num_particles)
    u = _isotropic_units(k_vang, num_particles)
    r_a = getattr(virial, "r_a", None)
    if r_a is None:
        vel = speed[:, None] * u
    else:
        # Osipkov-Merritt: with w = gamma v_t (gamma = sqrt(1+r^2/r_a^2))
        # the OM DF f(Q) is ISOTROPIC in (v_r, w)-space — Q = psi -
        # (v_r^2 + w^2)/2 and the velocity volume element picks up only
        # an r-dependent constant — so the isotropic draw above IS the
        # (v_r, w) draw; mapping back just divides the tangential part
        # by gamma(r).  Energy stays bounded: v^2 <= s^2 <= 2 psi.
        # rhat is the position draw's own unit vector (exact at r = 0).
        mu = jnp.sum(u * rhat, axis=1, keepdims=True)
        gamma = jnp.sqrt(1.0 + (radius / r_a) ** 2)[:, None]
        vel = speed[:, None] * (mu * rhat
                                + (u - mu * rhat) / gamma.astype(u.dtype))

    fields = OrderedDict()
    fields[short, "particle_position"] = np.asarray(pos)
    fields[short, "particle_velocity"] = np.asarray(vel)
    fields[short, "particle_mass"] = np.full(num_particles,
                                             mtot / num_particles)
    if compute_potential:
        # exact-radius evaluation for the OUTPUT potential (the lerped
        # psi_p above only bounds the escape-speed cap); reference
        # splines at each radius, virial.py:224-234
        from .core.interp import is_loguniform, spline_eval_loguniform

        if is_loguniform(model["radius"]):
            psi_sub = spline_eval_loguniform(
                cubic_spline(rgrid, psi_grid), radius_sub)
        else:
            # clamp like the log-uniform path (below-grid draws exist:
            # the sampling CDF starts at r = 0)
            psi_sub = spline_eval(
                cubic_spline(rgrid, psi_grid),
                jnp.clip(radius_sub, rgrid[0], rgrid[-1]))
        phi = -_tile(psi_sub, sub_sample, num_particles)
        fields[short, "particle_potential"] = np.asarray(phi)
    return ClusterParticles(short, fields)
