"""Fused on-device IC pipelines — the production fast path.

The class-based API (ClusterModel / VirialEquilibrium / ClusterParticles)
mirrors the reference's workflow with host-side containers.  This module is
the TPU-native end-to-end path: ONE jitted program takes cluster parameters
and a PRNG key and materializes a complete N-particle merger IC on device —
no host round-trips, f64 for the equilibrium solve, f32 for the per-particle
phase-space draws (matching the float32 precision the reference writes to
Gadget files, particles.py:477).

Used by bench.py for the headline metric (BASELINE.md: 1e7-particle
three-component binary merger in < 5 s on one chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.interp import adjacent_pairs
from .parallel.ensemble import build_one_cluster
from .virial import (compute_df, om_extended_df,
                     speed_inverse_cdf_table, speed_table_defaults)

__all__ = ["build_merger_models", "build_speed_tables",
           "build_radius_tables", "sample_merger_ic", "binary_merger_ic",
           "sample_merger_ic_sharded", "merger_ic_fused",
           "attach_field_to_particles"]


@partial(jax.jit, static_argnames=("num_points", "with_star_df", "r_a",
                                   "gravity"))
def build_merger_models(M200, conc, z=0.1, num_points=1000,
                        with_star_df=True, r_a=None,
                        gravity="newtonian"):
    """vmapped equilibrium builds (+DM and stellar DFs) for each halo.

    ``r_a``: Osipkov-Merritt anisotropy radius (kpc) — the DFs become
    f(Q) of the AUGMENTED density rho_Q = (1 + r^2/r_a^2) rho (same
    Abel inversion; virial.VirialEquilibrium docstring has the math).
    ``None`` = ergodic/isotropic."""

    def one(m, c):
        fields = build_one_cluster(m, c, z=z, num_points=num_points,
                                   with_df=(r_a is None), gravity=gravity)
        ee = -fields["gravitational_potential"][::-1]
        aug = (1.0 if r_a is None
               else 1.0 + (fields["radius"] / r_a) ** 2)
        if r_a is not None:
            # OM: f(Q) splined on the power-law-extended energy grid
            # (rho_Q's nonzero boundary slope; virial.om_extended_df
            # docstring) — build_speed_tables uses the *_ext arrays
            n = ee.shape[0]
            ee_ext, dm_ext = om_extended_df(
                ee, (fields["dark_matter_density"] * aug)[::-1])
            fields["df_ee_ext"] = ee_ext
            fields["dm_df_ext"] = dm_ext
            fields["dm_df"] = dm_ext[ee_ext.shape[0] - n:][::-1]
        if with_star_df:
            sden = (fields["stellar_density"] * aug)[::-1]
            if r_a is None:
                fields["star_df"] = compute_df(ee, sden)[::-1]
            else:
                ee_ext, st_ext = om_extended_df(ee, sden)
                fields["star_df_ext"] = st_ext
                fields["star_df"] = st_ext[ee_ext.shape[0]
                                           - ee.shape[0]:][::-1]
        return fields

    return jax.vmap(one)(M200, conc)


@partial(jax.jit, static_argnames=("n_rows", "star_n_rows"))
def build_speed_tables(fields, n_rows=256, star_n_rows=64):
    """Per-halo inverse speed-CDF tables for DM and stars.

    Builder arguments come from :func:`virial.speed_table_defaults` — the
    SAME defaults the class API uses (by default: float32 accumulate/invert;
    the f64 matmul-cumsum was the dominant warm-time cost of the merger
    pipeline on TPU under f64 MXU emulation).

    ``n_rows``: table rows live on an ``n_rows``-point log-radius subgrid
    instead of the full model grid (None = one row per grid point).  The
    draw path interpolates rows onto the radius-quantile nodes regardless
    (:func:`_build_joint_speed_pairs`), and the speed distribution varies
    smoothly with psi: the resulting joint table matches the 1000-row one
    to median 8e-6 / p99 7e-5 relative, while the O(rows x n_s x n_q)
    build shrinks 4x (measured 229 -> 81 ms; it was the dominant stage
    after the row-gather draw redesign).

    ``star_n_rows`` + the coarse star n_s/n_q knobs: the STAR table gets
    the same reduced resolutions the ensemble datagen product uses
    (ensemble's star_n_rows=64/star_n_s=256/star_n_q=256 rationale —
    per-halo table-build work serving ~10x fewer draws than DM; the
    r5 cfg6 stage attribution put speed tables at 45% of the warm scene
    cost, benchmarks/measurements_r5/r5_cfg6_stages.log).  None falls
    back to the DM resolutions (the pre-r5 behavior).
    """
    ee = -fields["gravitational_potential"][:, ::-1]
    rr = fields["radius"]
    kw = speed_table_defaults()
    kw_star = dict(kw, n_s=min(kw.get("n_s", 1024), 256),
                   n_q=min(kw.get("n_q", 512), 256))

    def tab(sp_ee, sp_f, rows, kw_sp):
        # (sp_ee, sp_f): the f(E) spline grid — the model grid for
        # ergodic DFs; om_extended_df's extended grid for OM (rows near
        # r_max query E below the model's lowest energy).
        def one(e_asc, r, e_sp, d_sp):
            if rows is None:
                return speed_inverse_cdf_table(e_sp, d_sp, row_ee=e_asc,
                                               **kw_sp)
            # psi on the ascending radius grid; rows at log-spaced radii
            # (same endpoints -> _log_grid_locate still computes the
            # row index), reversed so row energies ascend like ee
            r_rows = jnp.exp(jnp.linspace(jnp.log(r[0]), jnp.log(r[-1]),
                                          rows))
            psi = e_asc[::-1]
            row_ee = jnp.interp(r_rows, r, psi)[::-1]
            return speed_inverse_cdf_table(e_sp, d_sp, row_ee=row_ee,
                                           **kw_sp)

        return jax.vmap(one)(ee, rr, sp_ee, sp_f)

    if star_n_rows is None:
        star_rows, kw_star = n_rows, kw
    else:
        star_rows = star_n_rows
    if "df_ee_ext" in fields:
        return {"dm": tab(fields["df_ee_ext"], fields["dm_df_ext"],
                          n_rows, kw),
                "star": tab(fields["df_ee_ext"], fields["star_df_ext"],
                            star_rows, kw_star)}
    return {"dm": tab(ee, fields["dm_df"][:, ::-1], n_rows, kw),
            "star": tab(ee, fields["star_df"][:, ::-1], star_rows,
                        kw_star)}


_RQ = 2048  # radius quantile-table resolution


@partial(jax.jit, static_argnames=("dtype",))
def build_radius_tables(fields, r_max, dtype=jnp.float32):
    """Per-halo inverse radius-CDF quantile tables for every species.

    Sampling a radius then costs two gathers (lerp on the quantile table)
    instead of a 1000-knot binary search per particle; together with the
    log-spaced grid's *computed* index (no search) for psi/energy lookups,
    the per-particle cost drops to a handful of gathers.
    """
    from .core.interp import interp_monotone

    q = jnp.linspace(0.0, 1.0, _RQ)

    def one(rr, mm, rm):
        m_rmax = jnp.interp(rm, rr, mm)
        P = jnp.clip(mm / m_rmax, 0.0, 1.0)
        P = jnp.concatenate([jnp.zeros((1,), P.dtype), P])
        rins = jnp.concatenate([jnp.zeros((1,), rr.dtype), rr])
        # clamp at rm: beyond r_max, P plateaus at 1 and interp would walk
        # the top quantile bin out to the plateau's far edge, giving draws
        # past the truncation radius (the mass in that bin belongs AT rm).
        # interp_monotone: compare-matrix bracketing instead of
        # jnp.interp's per-query binary-search gathers — the same switch
        # the ensemble product's quantile nodes use; the r5 cfg6 stage
        # attribution put this interp at +1.16 s of the 4.0 s warm scene
        # batch (r5_cfg6_stages.log), gather-bound on TPU.
        r_q = jnp.minimum(interp_monotone(q, P, rins), rm)
        return r_q.astype(dtype), m_rmax

    out = {}
    for kind, key in [("gas", "gas_mass"), ("dm", "dark_matter_mass"),
                      ("star", "stellar_mass")]:
        r_q, m_rmax = jax.vmap(one)(fields["radius"], fields[key], r_max)
        out[kind] = r_q
        out[kind + "_mtot"] = m_rmax
    return out


def _log_grid_locate(radius, rr, dtype, n=None):
    """Fractional index of ``radius`` on the log-spaced grid ``rr`` —
    computed, not searched.  ``n`` relocates onto an n-point log grid
    sharing ``rr``'s endpoints (how the coarse speed-table row grid is
    addressed without materializing it)."""
    if n is None:
        n = rr.shape[0]
    logr0 = jnp.log(rr[0]).astype(dtype)
    dlog = ((jnp.log(rr[-1]) - jnp.log(rr[0])) / (n - 1)).astype(dtype)
    x = (jnp.log(radius) - logr0) / dlog
    x = jnp.clip(x, 0.0, n - 1 - 1e-6)
    # integer clamp too: in f32 the 1e-6 margin is below the ulp at
    # n - 1 for n >= ~32, so x can still round to exactly n - 1
    j = jnp.minimum(x.astype(jnp.int32), n - 2)
    return j, x - j.astype(dtype)


def _table_lerp(table, u):
    """1D lerp of ``table`` at fractional positions u in [0, 1].

    The two lerp endpoints come back as ONE row-of-2 gather from a paired
    (n-1, 2) copy of the table: on TPU a contiguous row gather costs ~2.7x
    LESS than a single scalar gather (measured on v5e,
    scripts/tpu_gather_experiments2.py A8), so pairing halves-then-some the
    draw stage's dominant cost.
    """
    from .core.interp import pair_col_lerp

    n = table.shape[0]
    pair = adjacent_pairs(table)  # (n-1, 2)
    x = jnp.clip(u * (n - 1), 0.0, n - 1 - 1e-6)
    j = jnp.minimum(x.astype(jnp.int32), n - 2)  # f32 ulp guard
    w = x - j.astype(table.dtype)
    return pair_col_lerp(pair, j, w)


def _isotropic(key, n, dtype):
    k1, k2 = jax.random.split(key)
    cos_t = jax.random.uniform(k1, (n,), minval=-1.0, maxval=1.0, dtype=dtype)
    phi = (2.0 * np.pi) * jax.random.uniform(k2, (n,), dtype=dtype)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                     axis=-1)


def _build_joint_speed_pairs(fields_h, s_inv, r_q, dtype):
    """Fold the per-psi inverse speed-CDF table onto the radius-quantile
    axis as ABSOLUTE speeds, paired along the quantile axis for row
    gathers.

    The (n_grid, n_q) speed-fraction table ``s_inv`` is interpolated onto
    the RQ radius-quantile nodes and multiplied by v_esc = sqrt(2 psi) at
    each node, giving a single (RQ, n_q) joint table: a particle's speed
    then needs no psi lookup at all.  Returned reshaped to
    ``(RQ * (n_q - 1), 2)`` so the speed lerp at row k, quantile m is the
    one row gather ``pairs[k * (n_q - 1) + m]``.  O(RQ x n_q) elementwise
    work — trivial against the O(N_particle) draws it accelerates.
    """
    rr = fields_h["radius"]
    psi_r = (-fields_h["gravitational_potential"]).astype(dtype)
    j, w = _log_grid_locate(r_q.astype(dtype), rr, dtype)
    psi_q = (1.0 - w) * psi_r[j] + w * psi_r[j + 1]
    n_rows, n_q = s_inv.shape
    # s_inv rows follow energies ascending = row radii DESCENDING on an
    # n_rows-point log grid sharing rr's endpoints (build_speed_tables):
    # bracketing rows are (n-2-jr, n-1-jr) with weight (1 - wr)
    jr, wr = _log_grid_locate(r_q.astype(dtype), rr, dtype, n=n_rows)
    k_row = jnp.clip(n_rows - 2 - jr, 0, n_rows - 2)
    from .virial import _banded_row_lerp

    # banded-weight matmul instead of two wide-row gathers (see
    # virial._banded_row_lerp; the fold was gather-bound at batch scale)
    srow = _banded_row_lerp(s_inv.astype(dtype), k_row, (1.0 - wr))
    joint = srow * jnp.sqrt(2.0 * psi_q)[:, None]  # (RQ, n_q)
    return adjacent_pairs(joint).reshape(-1, 2)


def _sample_collisionless(key, fields_h, s_inv, r_q, m_rmax, n, center,
                          bulk_v, dtype, r_a=None):
    """Positions + virialized velocities for one halo's DM or stars.

    Per particle: ONE row-of-2 gather for the radius (paired quantile
    table) + ONE row-of-2 gather for the speed (joint absolute-speed table,
    :func:`_build_joint_speed_pairs`) — no psi lookup, no binary searches.
    The joint table's radius-quantile row is picked stochastically between
    the two nodes bracketing the drawn radius (Bernoulli on the lerp
    weight), which preserves the conditional speed distribution to the
    table's O(1/RQ) resolution; measured 5.7x faster than the previous
    8-scalar-gather draw (scripts/tpu_gather_experiments2.py B).

    ``r_a``: with the OM-augmented speed tables (f(Q) is isotropic in
    (v_r, gamma v_t) space), the draw maps back by dividing the
    velocity's tangential components by gamma(r) = sqrt(1 + r^2/r_a^2)
    — the same scheme as the single-cluster products
    (parallel/ensemble.py, sampling.generate_collisionless_particles).
    """
    kr, kv, kb, ka, kva = jax.random.split(key, 5)
    rq = r_q.astype(dtype)
    RQ = rq.shape[0]
    n_q = s_inv.shape[1]
    r_pair = adjacent_pairs(rq)                               # (RQ-1, 2)
    j_pair = _build_joint_speed_pairs(fields_h, s_inv, rq, dtype)

    from .core.interp import pair_col_lerp

    u = jax.random.uniform(kr, (n,), dtype=dtype)
    x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-6)
    kq = jnp.minimum(x.astype(jnp.int32), RQ - 2)  # f32 ulp guard
    wq = x - kq.astype(dtype)
    radius = pair_col_lerp(r_pair, kq, wq)           # column gather 1

    uq = jax.random.uniform(kv, (n,), dtype=dtype)
    qm = jnp.clip(uq * (n_q - 1), 0.0, n_q - 1 - 1e-6)
    m = jnp.minimum(qm.astype(jnp.int32), n_q - 2)  # f32 ulp guard
    wm = qm - m.astype(dtype)
    bern = jax.random.uniform(kb, (n,), dtype=dtype) < wq
    k_row = kq + bern.astype(jnp.int32)
    speed = pair_col_lerp(j_pair, k_row * (n_q - 1) + m,
                          wm)                        # column gather 2

    rhat = _isotropic(ka, n, dtype)
    pos = radius[:, None] * rhat + center.astype(dtype)
    u = _isotropic(kva, n, dtype)
    if r_a is None:
        vdir = u
    else:
        mu = jnp.sum(u * rhat, axis=1, keepdims=True)
        gamma = jnp.sqrt(1.0 + (radius / jnp.asarray(r_a, dtype)) ** 2)
        vdir = mu * rhat + (u - mu * rhat) / gamma[:, None]
    vel = speed[:, None] * vdir + bulk_v.astype(dtype)
    pmass = (m_rmax / n).astype(dtype) * jnp.ones((n,), dtype)
    return pos, vel, pmass


def _sample_gas_halo(key, fields_h, r_q, m_rmax, n, center, dtype):
    """Gas positions (zero velocity pre-mix) for one halo."""
    kr, ka = jax.random.split(key)
    u = jax.random.uniform(kr, (n,), dtype=dtype)
    radius = _table_lerp(r_q, u)
    pos = radius[:, None] * _isotropic(ka, n, dtype) + center.astype(dtype)
    pmass = (m_rmax / n).astype(dtype) * jnp.ones((n,), dtype)
    return pos, pmass


def _mix_gas(pos, fields, centers, velocities, dtype):
    """Density-weighted gas mixing over all halos
    (reference particles.py:587-639, vectorized; log-grid computed-index
    interpolation — radii beyond the grid clamp to the last point, whose
    density is ~0 at rmax=10^4 kpc).

    Per particle per halo: ONE row-of-4 gather of
    ``[rho_j, (rho e)_j, rho_{j+1}, (rho e)_{j+1}]`` instead of four scalar
    gathers — 2.7x faster measured (scripts/tpu_gather_experiments2.py C).
    The halo loop is a static Python unroll (H is 1-3) so each gather
    stays a cheap 1D row fetch rather than a 2D (halo, row) gather.
    """
    H = centers.shape[0]
    dens_t = fields["density"].astype(dtype)
    e_t = (1.5 * fields["pressure"] / fields["density"]).astype(dtype)
    de = jnp.stack([dens_t, dens_t * e_t], axis=-1)          # (H, n, 2)
    packed = jnp.concatenate([de[:, :-1], de[:, 1:]], axis=-1)  # (H, n-1, 4)

    dens = 0.0
    eint = 0.0
    mom = 0.0
    for i in range(H):
        r = jnp.sqrt(((pos - centers[i].astype(dtype)) ** 2).sum(axis=1))
        j, w = _log_grid_locate(r, fields["radius"][i], dtype)
        cols = packed[i].T[:, j]             # one transposed column gather
        d = (1.0 - w) * cols[0] + w * cols[2]
        e = (1.0 - w) * cols[1] + w * cols[3]
        dens = dens + d
        eint = eint + e
        mom = mom + velocities[i].astype(dtype)[None, :] * d[:, None]
    return dens, eint / dens, mom / dens[:, None]


def _potential_at(pos, fields, centers, dtype):
    """Total gravitational potential at particle positions: sum of every
    halo's radial Phi(r), each lerp one row-of-2 gather on the log-grid
    computed index."""
    H = centers.shape[0]
    phi_t = fields["gravitational_potential"].astype(dtype)
    pairs = adjacent_pairs(phi_t)                             # (H, n-1, 2)

    from .core.interp import pair_col_lerp

    total = 0.0
    for i in range(H):
        r = jnp.sqrt(((pos - centers[i].astype(dtype)) ** 2).sum(axis=1))
        j, w = _log_grid_locate(r, fields["radius"][i], dtype)
        total = total + pair_col_lerp(pairs[i], j, w)
    return total


@partial(jax.jit, static_argnames=("n_gas", "n_dm", "n_star", "n_tracer",
                                   "dtype", "compute_potential", "r_a"))
def sample_merger_ic(fields, tables, centers, velocities, r_max, key,
                     n_gas, n_dm, n_star, n_tracer=None, dtype=jnp.float32,
                     compute_potential=False, r_a=None):
    """One fused program: draw every particle of an H-halo merger.

    fields/tables carry a leading halo axis; n_* are per-halo tuples of
    static counts (``n_tracer`` optional: massless tracers following the
    gas distribution).  ``tables`` must include the speed tables
    ("dm"/"star") and radius quantile tables (build_radius_tables).
    ``compute_potential`` adds per-particle total gravitational potentials.
    ``r_a``: Osipkov-Merritt anisotropy radius — the speed tables must
    then come from OM-augmented DFs (build_merger_models(r_a=...)); the
    velocity directions map back by gamma(r) (see _sample_collisionless).
    Returns a dict of device arrays (f32 by default).
    """
    H = centers.shape[0]
    out = {}
    keys = jax.random.split(key, 4 * H)
    rtab = tables["radius"]
    if n_tracer is None:
        n_tracer = (0,) * H

    gas_pos, gas_mass = [], []
    dm_pos, dm_vel, dm_mass = [], [], []
    st_pos, st_vel, st_mass = [], [], []
    tr_pos = []
    for i in range(H):
        f_h = jax.tree_util.tree_map(lambda a: a[i], fields)
        if n_gas[i] > 0:
            p, pm = _sample_gas_halo(keys[4 * i], f_h, rtab["gas"][i],
                                     rtab["gas_mtot"][i], n_gas[i],
                                     centers[i], dtype)
            gas_pos.append(p)
            gas_mass.append(pm)
        if n_dm[i] > 0:
            p, v, pm = _sample_collisionless(
                keys[4 * i + 1], f_h, tables["dm"][i], rtab["dm"][i],
                rtab["dm_mtot"][i], n_dm[i], centers[i], velocities[i],
                dtype, r_a=r_a)
            dm_pos.append(p)
            dm_vel.append(v)
            dm_mass.append(pm)
        if n_star[i] > 0:
            p, v, pm = _sample_collisionless(
                keys[4 * i + 2], f_h, tables["star"][i], rtab["star"][i],
                rtab["star_mtot"][i], n_star[i], centers[i], velocities[i],
                dtype, r_a=r_a)
            st_pos.append(p)
            st_vel.append(v)
            st_mass.append(pm)
        if n_tracer[i] > 0:
            p, _ = _sample_gas_halo(keys[4 * i + 3], f_h, rtab["gas"][i],
                                    rtab["gas_mtot"][i], n_tracer[i],
                                    centers[i], dtype)
            tr_pos.append(p)

    if gas_pos:
        gp = jnp.concatenate(gas_pos)
        dens, eint, gvel = _mix_gas(gp, fields, centers, velocities, dtype)
        out["gas", "particle_position"] = gp
        out["gas", "particle_velocity"] = gvel
        out["gas", "particle_mass"] = jnp.concatenate(gas_mass)
        out["gas", "density"] = dens
        out["gas", "thermal_energy"] = eint
    if dm_pos:
        out["dm", "particle_position"] = jnp.concatenate(dm_pos)
        out["dm", "particle_velocity"] = jnp.concatenate(dm_vel)
        out["dm", "particle_mass"] = jnp.concatenate(dm_mass)
    if st_pos:
        out["star", "particle_position"] = jnp.concatenate(st_pos)
        out["star", "particle_velocity"] = jnp.concatenate(st_vel)
        out["star", "particle_mass"] = jnp.concatenate(st_mass)
    if tr_pos:
        tp = jnp.concatenate(tr_pos)
        out["tracer", "particle_position"] = tp
        out["tracer", "particle_velocity"] = jnp.zeros_like(tp)
        out["tracer", "particle_mass"] = jnp.zeros((tp.shape[0],), dtype)
    if compute_potential:
        for sp in ("gas", "dm", "star"):
            if (sp, "particle_position") in out:
                out[sp, "particle_potential"] = _potential_at(
                    out[sp, "particle_position"], fields, centers, dtype)
    return out


@partial(jax.jit, static_argnames=("num_points", "n_gas", "n_dm", "n_star",
                                   "n_tracer", "dtype", "compute_potential",
                                   "r_a", "gravity"))
def merger_ic_fused(M200, conc, centers, velocities, r_max, key,
                    n_gas, n_dm, n_star, n_tracer=None, z=0.1,
                    num_points=1000, dtype=jnp.float32,
                    compute_potential=False, r_a=None,
                    gravity="newtonian"):
    """The entire merger IC — equilibrium models, DFs, tables, every
    particle draw — as ONE jitted program.

    Functionally identical to build_merger_models + build_speed_tables +
    build_radius_tables + sample_merger_ic, but a single dispatch: under
    the axon tunnel each executed program costs a host round-trip (~0.1 s),
    so fusing the four stages removes ~3 RPCs from the critical path and
    lets XLA overlap table construction with the draws.

    ``r_a``: Osipkov-Merritt anisotropy radius (kpc; static) — DFs and
    draws switch to the radially-anisotropic f(Q) product.
    """
    fields = build_merger_models.__wrapped__(M200, conc, z=z,
                                             num_points=num_points, r_a=r_a,
                                             gravity=gravity)
    tables = build_speed_tables.__wrapped__(fields)
    tables["radius"] = build_radius_tables.__wrapped__(fields, r_max)
    parts = sample_merger_ic.__wrapped__(
        fields, tables, centers, velocities, r_max, key, n_gas, n_dm,
        n_star, n_tracer=n_tracer, dtype=dtype,
        compute_potential=compute_potential, r_a=r_a)
    return parts, fields


def sample_merger_ic_sharded(mesh, fields, tables, centers, velocities,
                             r_max, key, n_gas, n_dm, n_star, n_tracer=None,
                             axis: str = "part", dtype=jnp.float32,
                             compute_potential=False):
    """Multi-chip variant of :func:`sample_merger_ic`: the particle draws
    shard over the ``axis`` mesh dimension.

    Model fields and tables are replicated (they are grid-sized); each
    device draws ``n/n_dev`` particles of every species with an independent
    fold_in PRNG stream, and every output array comes back sharded along
    its particle axis — ready for sharded downstream compute or per-host
    export.  Counts must divide the axis size.
    """
    from jax.sharding import PartitionSpec as P

    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def div(tup):
        if tup is None:
            return None
        assert all(n % n_dev == 0 for n in tup), \
            f"counts {tup} must divide mesh axis {axis}={n_dev}"
        return tuple(n // n_dev for n in tup)

    ng, nd, ns, nt = div(n_gas), div(n_dm), div(n_star), div(n_tracer)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_dev))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(axis)),
             out_specs=P(axis),
             check_vma=False)
    def _draw(fields_, tables_, centers_, velocities_, r_max_, key_shard):
        return sample_merger_ic(fields_, tables_, centers_, velocities_,
                                r_max_, key_shard[0], ng, nd, ns,
                                n_tracer=nt, dtype=dtype,
                                compute_potential=compute_potential)

    with mesh:
        return _draw(fields, tables, centers, velocities, r_max, keys)


def attach_field_to_particles(parts: dict, field, ptype: str = "gas"):
    """Trilinear-sample a 3D ClusterField onto pipeline particle positions,
    entirely on device (the fused-path analogue of
    fields.ClusterField.map_field_to_particles).

    Adds ``(ptype, field._name)`` of shape (N, 3) to the dict and returns it.
    """
    from .fields.grf import _trilinear

    pos = parts[ptype, "particle_position"]
    g = jnp.stack([jnp.asarray(field.gx), jnp.asarray(field.gy),
                   jnp.asarray(field.gz)]).astype(pos.dtype)
    vals = _trilinear(jnp.asarray(field.x, pos.dtype),
                      jnp.asarray(field.y, pos.dtype),
                      jnp.asarray(field.z, pos.dtype), g, pos)
    parts[ptype, field._name] = vals.T
    return parts


def binary_merger_ic(M200s, concs, centers, velocities, num_particles,
                     r_max=5000.0, z=0.1, key=None, num_points=1000,
                     dtype=jnp.float32):
    """End-to-end binary (or 1-3 halo) merger IC, fully on device.

    num_particles: dict like {"gas": 5_000_000, "dm": 4_000_000,
    "star": 1_000_000} — total counts, pro-rated per halo by mass like
    ClusterICs._determine_num_particles (ics.py:100-160; equal-mass halos
    split evenly).

    Returns (fields_dict_of_device_arrays, models_fields, tables).
    """
    if key is None:
        key = jax.random.key(0)
    M200s = jnp.asarray(M200s, jnp.float64)
    concs = jnp.asarray(concs, jnp.float64)
    H = M200s.shape[0]
    centers = jnp.asarray(centers, jnp.float64).reshape(H, 3)
    velocities = jnp.asarray(velocities, jnp.float64).reshape(H, 3)
    if np.isscalar(r_max):
        r_max = jnp.full((H,), float(r_max))
    else:
        r_max = jnp.asarray(r_max, jnp.float64)

    fields = build_merger_models(M200s, concs, z=z, num_points=num_points)
    tables = build_speed_tables(fields)
    tables["radius"] = build_radius_tables(fields, r_max)

    # pro-rate counts by per-halo mass within r_max (host-side, static)
    rr = np.asarray(fields["radius"])
    weights = {}
    for kind, mkey in [("gas", "gas_mass"), ("dm", "dark_matter_mass"),
                       ("star", "stellar_mass"), ("tracer", "gas_mass")]:
        mm = np.asarray(fields[mkey])
        m_at = np.array([np.interp(float(r_max[i]), rr[i], mm[i])
                         for i in range(H)])
        weights[kind] = m_at / m_at.sum()

    def counts(kind):
        tot = num_particles.get(kind, 0)
        n = [int(round(tot * weights[kind][i])) for i in range(H)]
        if n and tot:
            n[-1] = tot - sum(n[:-1])
        return tuple(n)

    particles = sample_merger_ic(
        fields, tables, centers, velocities, r_max, key,
        counts("gas"), counts("dm"), counts("star"),
        n_tracer=counts("tracer") if num_particles.get("tracer") else None,
        dtype=dtype)
    return particles, fields, tables
