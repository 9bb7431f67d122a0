"""Ensemble cluster generation: thousands of equilibrium models per launch.

This is the capability the reference lacks entirely (SURVEY.md §2.3): the
whole model pipeline (profiles -> HSE fields -> Eddington DF) is a pure
function of the cluster parameters, so it ``vmap``s over a parameter batch
and ``shard_map``s/``jit``s over an (ens,) device-mesh axis, with XLA
inserting the collectives.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import log_radius_grid
from ..core.h5raw import RawWriter
from ..model.builders import build_from_dens_and_tden
from ..profiles.library import (
    snfw_density_profile,
    snfw_mass_profile,
    snfw_total_mass,
    vikhlinin_density_profile,
)
from ..profiles.relations import f_gas
from ..profiles.solvers import (
    find_overdensity_radius,
    find_radius_mass,
    mass_within,
)
from ..virial import compute_df, om_extended_df

__all__ = ["build_one_cluster", "build_ensemble",
           "sample_ensemble_params", "ensemble_datagen",
           "ensemble_datagen_multihost", "datagen_batches",
           "prorate_species_counts", "read_catalog",
           "catalog_batches", "catalog_to_particles", "verify_catalog"]


def build_one_cluster(M200, conc, z=0.1, f_g=None, rmin=0.1, rmax=10000.0,
                      num_points=1000, with_df: bool = True,
                      gravity: str = "newtonian"):
    """Build the flagship cluster configuration from (M200, c).

    sNFW total profile + Vikhlinin gas rescaled to f_gas(M500) * M500 +
    2% stellar component — the reference test suite's canonical cluster
    (tests/utils/generators.py:37-104) — returning the full HSE field dict
    and (optionally) the dark-matter distribution function.

    ``gravity``: a registered law name ("newtonian"/"aqual"/"qumond"/
    "emond", model/gravity.py) — the total-density profile is the MATTER
    density and the field/potential/DF follow the law (the wiring of
    model/builders.py, threaded here so the datagen products can stream
    MOND catalogs).  Law parameters take the config defaults.
    """
    r200 = find_overdensity_radius(M200, 200.0, z=z)
    a = r200 / conc
    M = snfw_total_mass(M200, r200, a)
    rhot = snfw_density_profile(M, a)
    Mt = snfw_mass_profile(M, a)
    r500, M500 = find_radius_mass(Mt, z=z, delta=500.0)
    if f_g is None:
        f_g = f_gas(M500)
    rhog = vikhlinin_density_profile(1.0, 100.0, r200, 1.0, 0.67, 3)
    rhog = (f_g * M500 / mass_within(rhog, r500)) * rhog
    rhos = 0.02 * rhot

    rr = log_radius_grid(rmin, rmax, num_points)
    fields = build_from_dens_and_tden(rr, rhog, rhot, stellar_density=rhos,
                                      gravity=gravity)
    if with_df:
        ee = -fields["gravitational_potential"][::-1]
        pden = fields["dark_matter_density"][::-1]
        fields["dm_df"] = compute_df(ee, pden)[::-1]
    return fields


@partial(jax.jit, static_argnames=("num_points", "with_df"))
def build_ensemble(M200, conc, z=0.1, num_points=1000, with_df: bool = True):
    """vmapped batch of clusters: (B,) M200 and conc -> batched field dict.

    jit once per (batch, num_points) shape; shard the inputs over an 'ens'
    mesh axis and XLA runs each shard's batch locally with no communication.
    """
    fn = lambda m, c: build_one_cluster(m, c, z=z, num_points=num_points,
                                        with_df=with_df)
    return jax.vmap(fn)(M200, conc)


def sample_ensemble_params(key, n, logM_range=(14.0, 15.3),
                           conc_range=(3.0, 8.0)):
    """Draw an (M200, conc) ensemble; conc anti-correlates with mass in a
    simple power-law fashion plus scatter (a stand-in c(M) relation)."""
    k1, k2 = jax.random.split(key)
    logM = jax.random.uniform(k1, (n,), minval=logM_range[0],
                              maxval=logM_range[1], dtype=jnp.float64)
    M200 = 10.0**logM
    c_mean = 5.0 * (M200 / 1.0e15) ** (-0.1)
    scatter = jax.random.normal(k2, (n,), dtype=jnp.float64) * 0.3
    conc = jnp.clip(c_mean * jnp.exp(scatter), conc_range[0], conc_range[1])
    return M200, conc


# Bump whenever the MEANING of the draws changes for fixed config (a new
# table scheme, a different field-evaluation rule, ...) — resuming a
# catalog written under another version raises instead of silently
# splicing two draw conventions into one file.  History: 1 = the r4
# full-species product with gas energies lerped between radius-quantile
# nodes; 2 = gas energies (and class-API fields) evaluated AT the drawn
# radius (core/interp.loguniform_lerp — up to ~60% different across the
# innermost mass bin).
_DRAWS_VERSION = 2
# OM (r_a != None) catalogs version separately: 3 = the round-5
# psi-grid-extended f(Q) (virial.compute_df_truncated; boundary residual
# 36% -> 0.8%), which changes every OM draw for fixed config while
# leaving isotropic catalogs untouched — so isotropic resumes keep
# working across the change and OM resumes refuse loudly.
_OM_DRAWS_VERSION = 3


def _speed_table_key():
    """``speed_table_defaults()`` as a hashable memo key, so the cached
    factories below see config changes (``cgparams['numerical']``)."""
    from ..virial import speed_table_defaults

    return tuple(sorted(speed_table_defaults().items(),
                        key=lambda kv: kv[0]))


def _datagen_batch_fn(num_points, n_part, n_rows=128, rq=2048, r_a=None,
                      gravity="newtonian"):
    """One jitted program: (M200, conc, keys) batch -> per-cluster DM
    phase-space draws (positions, velocities, particle mass).

    Delegates to the full-species factory with gas = star = 0 — ONE
    datagen core (the DM-only branch of :func:`_datagen_full_batch_fn`),
    so the int-count and dict-count products cannot drift (the
    escape-speed cap, table knobs, and draw scheme are shared; a
    round-4 review caught the two paths diverging on the v_esc cap).
    Memoized on every compile-time knob (grid/table/count sizes + the
    ``cgparams['numerical']`` table config), so repeated API calls with
    the same shapes reuse one jitted program — see
    tests/test_recompilation.py.
    """
    return _datagen_batch_cached(num_points, n_part, n_rows, rq,
                                 None if r_a is None else float(r_a),
                                 str(gravity), _speed_table_key())


@lru_cache(maxsize=32)
def _datagen_batch_cached(num_points, n_part, n_rows, rq, r_a, gravity,
                          kw_items):
    full = _datagen_full_batch_cached(num_points, n_part, 0, 0, n_rows,
                                      rq, 64, 512, 256, 256, r_a, gravity,
                                      kw_items)

    # jit-of-jit: tracing `full` inlines its jaxpr, so exactly one
    # program compiles; the outer jit also carries the cache
    # introspection the recompilation tests assert on
    @jax.jit
    def batch(M200, conc, key):
        return full(M200, conc, key)["dm"]

    return batch


def _datagen_full_batch_fn(num_points, n_dm, n_gas, n_star, n_rows=128,
                           rq=2048, star_n_rows=64, star_rq=512,
                           star_n_s=256, star_n_q=256, r_a=None,
                           gravity="newtonian"):
    """Memoized factory for the full-species datagen program — the ONE
    datagen core (the int-count path delegates here with gas=star=0;
    species with a zero count are simply absent from the output dict).

    The ``star_*`` knobs set the STAR species' table resolutions
    independently of the DM defaults: the star table build is per-cluster
    work (CDF inversion O(rows x n_q x n_s), joint table O(rq x n_q))
    while stars draw ~10x fewer particles than DM, so full-resolution
    star tables dominated cfg5c (+3.3 s of the +3.65 s full-species
    overhead, benchmarks/measurements_r4/r4_cfg5c_attr.log).  At 1e4
    draws/cluster the coarse defaults' O(1/rq + 1/n_q) table error is
    far below the 1/sqrt(n) statistical floor — pinned by the
    KS-vs-class-API test (tests/test_parallel.py).
    """
    return _datagen_full_batch_cached(num_points, n_dm, n_gas, n_star,
                                      n_rows, rq, star_n_rows, star_rq,
                                      star_n_s, star_n_q,
                                      None if r_a is None else float(r_a),
                                      str(gravity), _speed_table_key())


@lru_cache(maxsize=32)
def _datagen_full_batch_cached(num_points, n_dm, n_gas, n_star, n_rows,
                               rq, star_n_rows, star_rq, star_n_s,
                               star_n_q, r_a, gravity, kw_items):
    """One jitted program: (M200, conc, key) batch -> per-cluster
    FULL-SPECIES draws — the complete per-cluster IC product at ensemble
    scale (reference model.py:838-1039 gas generator + virial.py:108-236
    collisionless generator, per cluster in the vmapped batch):

    * dm / star: positions + velocities from the per-species mass CDF and
      joint absolute-speed table (the cfg5b draw scheme; the star species
      gets its own Eddington DF from the stellar density in the shared
      total potential);
    * gas: positions from the gas-mass CDF + thermal energy
      e = 1.5 P / rho lerped at the particle radius (gas velocities are
      identically zero in HSE and are not materialized).

    Gather design: the radius-quantile table is packed as row-of-4
    ``(r_lo, r_hi, x_lo, x_hi)`` where x is v_esc (collisionless — the
    local escape-speed cap rides the radius gather for free; row width 4
    is the measured gather knee, docs/performance.md E4) or the thermal
    energy (gas — the energy lookup rides the same gather).
    """
    from ..core.interp import (
        adjacent_pairs,
        interp_monotone,
        loguniform_lerp,
    )
    from ..virial import (
        build_joint_speed_pairs,
        sample_speeds_joint,
        speed_inverse_cdf_table,
    )

    kw = dict(kw_items)

    def _row_idx(n):
        return np.unique(np.round(
            np.linspace(0, num_points - 1, min(n, num_points))).astype(int))

    row_idx = _row_idx(n_rows)
    row_idx_star = _row_idx(star_n_rows)
    kw_star = dict(kw, n_s=star_n_s, n_q=star_n_q)

    def _isotropic(key, n):
        k1, k2 = jax.random.split(key)
        mu = jax.random.uniform(k1, (n,), jnp.float32, -1.0, 1.0)
        phi = jax.random.uniform(k2, (n,), jnp.float32, 0.0,
                                 2.0 * float(np.pi))
        s = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), mu], axis=1)

    def _draw_quantiles(key, n, rq_sp=rq):
        u = jax.random.uniform(key, (n,), jnp.float32)
        x = jnp.clip(u * (rq_sp - 1), 0.0, rq_sp - 1 - 1e-6)
        kq = jnp.minimum(x.astype(jnp.int32), rq_sp - 2)  # f32 ulp guard
        wq = x - kq.astype(jnp.float32)
        return kq, wq

    def _quantile_nodes(rr, mm, rq_sp=rq):
        """(rq_sp,) radius nodes at uniform mass quantiles."""
        qq = jnp.linspace(0.0, 1.0, rq_sp)
        return interp_monotone(qq * mm[-1], mm, rr)

    def _pack4(r_q, x_q):
        """(rq-1, 4) rows (r_lo, r_hi, x_lo, x_hi) for one row-of-4 gather."""
        rp = adjacent_pairs(r_q).astype(jnp.float32)
        xp = adjacent_pairs(x_q).astype(jnp.float32)
        return jnp.concatenate([rp, xp], axis=1)

    def _collisionless(f, row_ee, mass_field, df_grid, n_part, key,
                       rq_sp=rq, kw_sp=kw):
        # df_grid = (ee_spline, f_spline): the f(E) spline grid — the
        # model grid for ergodic DFs, om_extended_df's extended grid for
        # OM (rows near r_max query E below the model's lowest energy)
        tab = speed_inverse_cdf_table(df_grid[0], df_grid[1],
                                      row_ee=row_ee, **kw_sp)
        rr, mm = f["radius"], f[mass_field]
        r_q = _quantile_nodes(rr, mm, rq_sp)
        psi_q = interp_monotone(r_q, rr, -f["gravitational_potential"])
        table4 = _pack4(r_q, jnp.sqrt(2.0 * psi_q))
        joint = build_joint_speed_pairs(rr, -f["gravitational_potential"],
                                        row_ee, tab, r_q, dtype=tab.dtype,
                                        psi_q=psi_q)
        k_r, k_v, k_u, k_w = jax.random.split(key, 4)
        kq, wq = _draw_quantiles(k_r, n_part, rq_sp)
        # transposed column gather (core/interp.adjacent_pairs
        # docstring: same measured speed, no 32x-padded [N, 4] temp —
        # the row form compile-OOM'd cfg5d at batch 64)
        cols = table4.T[:, kq]
        radius = (1.0 - wq) * cols[0] + wq * cols[1]
        v_esc = (1.0 - wq) * cols[2] + wq * cols[3]
        speed = sample_speeds_joint(joint, tab.shape[1], kq, wq, k_v)
        # Bernoulli row selection can exceed the LOCAL escape speed by the
        # inter-node v_esc difference; cap rides the radius gather
        speed = jnp.minimum(speed, v_esc.astype(speed.dtype))
        rhat = _isotropic(k_u, n_part)
        pos = radius[:, None] * rhat
        u = _isotropic(k_w, n_part)
        speed = speed[:, None].astype(jnp.float32)
        if r_a is None:
            vel = speed * u
        else:
            # Osipkov-Merritt: the speed table above was built from the
            # AUGMENTED density's f(Q) (isotropic in (v_r, gamma v_t)
            # space), so the draw maps back by dividing the tangential
            # components by gamma(r) — same scheme as the class API
            # (sampling.generate_collisionless_particles)
            mu = jnp.sum(u * rhat, axis=1, keepdims=True)
            gamma = jnp.sqrt(1.0 + (radius / r_a) ** 2)[:, None]
            vel = speed * (mu * rhat + (u - mu * rhat) / gamma)
        pmass = (mm[-1] / n_part).astype(jnp.float32)
        return pos, vel, pmass

    def _gas(f, n_part, key):
        rr, mm = f["radius"], f["gas_mass"]
        r_q = _quantile_nodes(rr, mm)
        rp = adjacent_pairs(r_q).astype(jnp.float32)
        k_r, k_u = jax.random.split(key)
        kq, wq = _draw_quantiles(k_r, n_part)
        from ..core.interp import pair_col_lerp

        radius = pair_col_lerp(rp, kq, wq)
        # thermal energy at the DRAWN radius on the log-uniform model
        # grid (computed index, one row-of-2 gather) — lerping e between
        # the radius-quantile nodes was off by up to ~60% across the
        # wide innermost mass bin (loguniform_lerp docstring; caught by
        # verify_catalog on a deep gas draw)
        e_grid = (1.5 * f["pressure"] / f["density"]).astype(jnp.float32)
        energy = loguniform_lerp(radius, rr, e_grid)
        pos = radius[:, None] * _isotropic(k_u, n_part)
        pmass = (mm[-1] / n_part).astype(jnp.float32)
        return pos, energy, pmass

    def one(m, c, key):
        # for OM (r_a set) the per-species DFs are f(Q) of the AUGMENTED
        # density rho_Q = (1 + r^2/r_a^2) rho — same Abel inversion
        # (virial.VirialEquilibrium docstring has the math), splined on
        # the power-law-extended grid (rho_Q's nonzero boundary slope;
        # virial.om_extended_df docstring)
        f = build_one_cluster(m, c, num_points=num_points,
                              with_df=(r_a is None), gravity=gravity)
        ee = -f["gravitational_potential"][::-1]
        aug = (1.0 if r_a is None
               else 1.0 + (f["radius"] / r_a) ** 2)

        def df_grid(dens_key):
            if r_a is None and dens_key == "dark_matter_density":
                return ee, f["dm_df"][::-1]
            pden = (f[dens_key] * aug)[::-1]
            if r_a is None:
                return ee, compute_df(ee, pden)
            return om_extended_df(ee, pden)

        row_ee = ee[row_idx]
        k_dm, k_gas, k_star = jax.random.split(key, 3)
        out = {}
        if n_dm:
            out["dm"] = _collisionless(f, row_ee, "dark_matter_mass",
                                       df_grid("dark_matter_density"),
                                       n_dm, k_dm)
        if n_star:
            out["star"] = _collisionless(f, ee[row_idx_star],
                                         "stellar_mass",
                                         df_grid("stellar_density"),
                                         n_star, k_star, star_rq, kw_star)
        if n_gas:
            out["gas"] = _gas(f, n_gas, k_gas)
        return out

    @jax.jit
    def batch(M200, conc, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(M200.shape[0]))
        return jax.vmap(one)(M200, conc, keys)

    return batch


def prorate_species_counts(n_total, M200=1.5e15, conc=4.0, num_points=512):
    """Split a per-cluster particle budget across species by mass fraction
    (the reference's pro-rata rule, ics.py:100-160, applied to species
    instead of halos — ensemble batches need static per-species shapes, so
    the split is computed once from a representative cluster build).

    Returns ``{"dm": n_dm, "gas": n_gas, "star": n_star}`` summing to
    ``n_total``.
    """
    f = jax.jit(lambda m, c: build_one_cluster(
        m, c, num_points=num_points, with_df=False))(M200, conc)
    m_dm = float(f["dark_matter_mass"][-1])
    m_gas = float(f["gas_mass"][-1])
    m_star = float(f["stellar_mass"][-1])
    tot = m_dm + m_gas + m_star
    n_dm = int(round(n_total * m_dm / tot))
    n_gas = int(round(n_total * m_gas / tot))
    n_star = max(n_total - n_dm - n_gas, 0)
    return {"dm": n_dm, "gas": n_gas, "star": n_star}


def _resolve_batch_fn(n_particles_per_cluster, num_points, r_a=None,
                      gravity="newtonian"):
    """(full?, per-species counts, jitted batch program) for a datagen
    product selector (int = DM phase space, dict = full-species).  One
    jitted program per config; jit's shape-keyed cache handles the
    short final batch (it retraces once for the tail shape)."""
    if r_a is not None and not float(r_a) > 0.0:
        # r_a=0 would NaN-poison every velocity (aug density hits inf)
        # and, worse, 0.0 is the catalog attr's isotropic sentinel, so
        # verify_catalog's beta check would be silently SKIPPED on the
        # poisoned file; negatives only enter as r_a**2 and would record
        # a nonsense attr.  Same contract as VirialEquilibrium(r_a=...).
        raise ValueError(f"anisotropy_radius must be positive (got "
                         f"{r_a!r}); omit it (None) for the isotropic "
                         "product")
    from ..model.gravity import get_gravity

    get_gravity(gravity)  # unknown law names fail fast, before compile
    full = isinstance(n_particles_per_cluster, dict)
    if full:
        unknown = set(n_particles_per_cluster) - {"dm", "gas", "star"}
        if unknown:
            raise ValueError(
                f"unknown species {sorted(unknown)} in "
                "n_particles_per_cluster; expected keys from "
                "{'dm', 'gas', 'star'} (a typo here would otherwise "
                "silently drop the species from the catalog)")
        counts = {s: int(n_particles_per_cluster.get(s, 0))
                  for s in ("dm", "gas", "star")}
        batch_fn = _datagen_full_batch_fn(num_points, counts["dm"],
                                          counts["gas"], counts["star"],
                                          r_a=r_a, gravity=gravity)
    else:
        counts = None
        batch_fn = _datagen_batch_fn(num_points,
                                     int(n_particles_per_cluster),
                                     r_a=r_a, gravity=gravity)
    return full, counts, batch_fn


def aot_batch_fn(batch_fn, aot_dir, tag, example_args, prime=False):
    """Wrap a jitted datagen batch program with AOT-executable
    persistence (core/aot.py) — the datagen products' answer to the
    148-231 s fresh-process cold compile of the batch programs
    (VERDICT r4 missing #4; the headline bench program had this since
    r3, the datagen PRODUCT had no artifact path at all).

    ``tag`` names the artifact (the program fingerprint inside it is
    the real staleness key); ``example_args`` must carry the FULL-batch
    shapes — the returned callable uses the AOT executable for
    full-batch calls and falls back to the jit path for the tail batch
    (a different shape) or when no artifact loads.  ``prime=True``
    compiles + serializes when the artifact is missing or stale.

    Single-device clients only (the datagen mesh path keeps jit): the
    loaded executable takes default-placed arrays there, which is how
    the dispatcher already calls it."""
    import os

    from ..core.aot import artifact_path, load_compiled, save_compiled
    from ..core.logging import mylog

    if jax.local_device_count() != 1:
        mylog.warning("aot_dir ignored: AOT datagen artifacts are "
                      "single-device (client has %d devices)",
                      jax.local_device_count())
        return batch_fn
    path = artifact_path(aot_dir, tag)
    loaded = load_compiled(path, batch_fn, example_args)
    if loaded is None and prime:
        mylog.info("Priming datagen AOT artifact %s (compile + "
                   "serialize)...", path)
        loaded = save_compiled(batch_fn, example_args, path)
    if loaded is None:
        if os.path.exists(path):
            mylog.warning("Datagen AOT artifact %s exists but did not "
                          "load (stale program? wrong backend?); "
                          "falling back to jit", path)
        return batch_fn
    mylog.info("Datagen batch program loaded from AOT artifact %s", path)
    full_shape = jax.tree_util.tree_leaves(example_args)[0].shape

    def call(*args):
        if jax.tree_util.tree_leaves(args)[0].shape == full_shape:
            return loaded(*args)
        return batch_fn(*args)  # tail batch: different shape -> jit

    return call


def _aot_tag(product, **cfg):
    """Artifact tag: product name + short sha of the shape-determining
    config (collision avoidance only — the program fingerprint inside
    the artifact is the staleness key)."""
    import hashlib

    s = hashlib.sha256(repr(sorted(cfg.items())).encode()).hexdigest()[:8]
    return f"datagen-{product}-{s}"


def _make_dispatch(M200, conc, batch_fn, batch_size, key, mesh):
    """Batch dispatcher: slices the parameter arrays, folds the PRNG key
    on the batch offset (so draws are position-independent — the resume
    splice and the streaming form rely on it), and places the slices
    sharded over the mesh's ens axis when one is given."""
    def _dispatch(b0):
        Mb = M200[b0:b0 + batch_size]
        cb = conc[b0:b0 + batch_size]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if Mb.shape[0] % mesh.shape["ens"] == 0:
                sh = NamedSharding(mesh, PartitionSpec("ens"))
                Mb = jax.device_put(Mb, sh)
                cb = jax.device_put(cb, sh)
            with mesh:
                return Mb, cb, batch_fn(Mb, cb,
                                        jax.random.fold_in(key, b0))
        return Mb, cb, batch_fn(Mb, cb, jax.random.fold_in(key, b0))

    return _dispatch


def ensemble_datagen(M200, conc, filename, n_particles_per_cluster,
                     batch_size=256, num_points=512, key=None,
                     overwrite=False, resume=False, mesh=None,
                     anisotropy_radius=None, gravity="newtonian",
                     aot_dir=None, prime_aot=False,
                     _only_batches=None, _extra_attrs=None):
    """Stream an ensemble's particle draws to ONE HDF5 file.

    ``n_particles_per_cluster`` selects the product:

    * **int** — DM phase space only (the cfg5b benchmark program): each
      cluster lands as ``cluster_%06d/{particle_position,
      particle_velocity}`` (kpc, kpc/Myr) with ``M200 / conc /
      particle_mass`` attrs;
    * **dict** ``{"dm": n, "gas": n, "star": n}`` — the FULL per-cluster
      IC product (cfg5c): ``dm_position / dm_velocity / star_position /
      star_velocity / gas_position / gas_thermal_energy`` datasets plus
      per-species ``particle_mass_*`` attrs (gas velocities are
      identically zero in HSE and are not written).  Use
      :func:`prorate_species_counts` for a mass-pro-rated split.

    Clusters are processed in HBM-sized vmapped batches; the host HDF5
    writes of batch k overlap the device compute of batch k+1 (the next
    batch is dispatched asynchronously BEFORE the blocking
    device-to-host transfer of the current one).  Measured on one v5e:
    the batch program runs 254 clusters/s (DM) / 218 clusters/s
    (full-species) at 1e5 particles each; end-to-end with writes the
    tunnel-attached host here is D2H-bound (benchmarks/measurements_r4/
    r4_e2e.log) — on a co-located host the batch rate dominates.

    ``mesh``: an (ens, part) device mesh (:func:`~.mesh.make_mesh`) —
    each batch's parameters are placed sharded over the ``ens`` axis so
    every device draws its shard of the clusters with zero
    communication.  The partitioned program's f32 rounding differs from
    the single-device one by ~1 ulp (XLA fuses differently; pinned by
    test at rtol 5e-7), so the mesh's ens size is part of the resume
    config.  Batches whose length does not divide the ``ens`` axis (the
    final short batch) fall back to default placement.  ``None``
    (default) runs single-device.

    ``anisotropy_radius``: Osipkov-Merritt r_a in kpc (same for every
    cluster in the catalog) — collisionless species draw from the
    radially-anisotropic f(Q) with beta(r) = r^2/(r^2 + r_a^2)
    (virial.VirialEquilibrium docstring has the construction).  ``None``
    (default) is the ergodic/isotropic product.  Recorded in the
    catalog attrs and part of the resume config.

    ``resume=True`` restarts an interrupted run: completed batches are
    kept verbatim, the partially-written batch is deleted and recomputed
    (keys fold on the batch offset, so recomputed draws are identical
    to what an uninterrupted run would have produced), and only the
    remaining batches run.  A batch counts as complete only when the
    ``_batches_done`` marker attr — updated AFTER its raw data bytes
    hit the file — records it: dataset PRESENCE alone is not enough,
    because the raw write path materializes every dataset of a batch
    (metadata flush) before pwriting their extents, so a crash in that
    window leaves structurally-complete groups full of zeros.  Files
    from before this marker existed fall back to the presence check
    (with a warning).  The run configuration must match the
    file's recorded one (counts, batch_size, num_points, PRNG key,
    shard identity, and the library's draw-semantics version) —
    a mismatch would splice incompatible draws and raises instead.
    Deleted partial groups leave their (at most one batch of) file
    extent unreferenced — HDF5 does not reclaim it — which is the
    price of never rewriting completed data.  An already-complete
    catalog returns immediately.

    Returns the filename.
    """
    import pathlib

    import h5py

    from ..core.logging import mylog

    path = pathlib.Path(filename)
    if resume and overwrite:
        raise ValueError("resume=True and overwrite=True are mutually "
                         "exclusive (resume keeps completed batches; "
                         "overwrite discards the file)")
    resuming = resume and path.exists()
    if path.exists() and not overwrite and not resuming:
        raise IOError(f"{path} exists (pass overwrite=True, or "
                      "resume=True to continue an interrupted run)")
    M200 = jnp.asarray(M200, jnp.float64)
    conc = jnp.asarray(conc, jnp.float64)
    n_cl = int(M200.shape[0])
    if key is None:
        key = jax.random.key(0)
    full, counts, batch_fn = _resolve_batch_fn(n_particles_per_cluster,
                                               num_points,
                                               r_a=anisotropy_radius,
                                               gravity=gravity)
    mylog.info("Ensemble datagen: %d clusters x %s particles%s -> %s",
               n_cl, n_particles_per_cluster,
               "" if anisotropy_radius is None
               else f" (OM r_a={anisotropy_radius:g} kpc)", path)
    if aot_dir is not None and mesh is None:
        tag = _aot_tag("cluster", counts=counts or n_particles_per_cluster,
                       num_points=num_points, batch=int(batch_size),
                       r_a=anisotropy_radius, gravity=gravity)
        ex = (jnp.zeros((batch_size,), jnp.float64) + 1.0e15,
              jnp.full((batch_size,), 5.0, jnp.float64),
              jax.random.key(0))
        batch_fn = aot_batch_fn(batch_fn, aot_dir, tag, ex,
                                prime=prime_aot)
    _dispatch = _make_dispatch(M200, conc, batch_fn, batch_size, key, mesh)

    # catalog data goes through the raw pwrite-at-offset path — the
    # identical bytes with no HDF5 write machinery; 1.8-3x over H5Dwrite
    # depending on host state (core/h5raw.py docstring has the numbers)
    def _write_full(f, b0, Mb, cb, out):
        out = jax.tree_util.tree_map(np.asarray, out)  # blocks this batch
        raw = RawWriter(f)
        for i in range(Mb.shape[0]):
            g = f.create_group(f"cluster_{b0 + i:06d}")
            g.attrs["M200"] = float(Mb[i])
            g.attrs["conc"] = float(cb[i])
            for sp in ("dm", "star"):
                if sp in out:
                    pos, vel, pmass = out[sp]
                    g.attrs[f"particle_mass_{sp}"] = float(pmass[i])
                    raw.add(g, f"{sp}_position", pos[i])
                    raw.add(g, f"{sp}_velocity", vel[i])
            if "gas" in out:
                pos, energy, pmass = out["gas"]
                g.attrs["particle_mass_gas"] = float(pmass[i])
                raw.add(g, "gas_position", pos[i])
                raw.add(g, "gas_thermal_energy", energy[i])
        raw.flush()

    def _write_dm(f, b0, Mb, cb, out):
        pos, vel, pmass = (np.asarray(a) for a in out)
        raw = RawWriter(f)
        for i in range(Mb.shape[0]):
            g = f.create_group(f"cluster_{b0 + i:06d}")
            g.attrs["M200"] = float(Mb[i])
            g.attrs["conc"] = float(cb[i])
            g.attrs["particle_mass"] = float(pmass[i])
            raw.add(g, "particle_position", pos[i])
            raw.add(g, "particle_velocity", vel[i])
        raw.flush()

    write = _write_full if full else _write_dm
    # per-group dataset names a complete cluster must carry (gas carries
    # energies, not velocities; zero-count species are absent)
    if full:
        expected = []
        for sp in ("dm", "star"):
            if counts[sp]:
                expected += [f"{sp}_position", f"{sp}_velocity"]
        if counts["gas"]:
            expected += ["gas_position", "gas_thermal_energy"]
    else:
        expected = ["particle_position", "particle_velocity"]
    # the resume splice is only sound when the recomputed batches match
    # what the interrupted run would have produced — everything that
    # shapes the draws is recorded and must agree
    config = {"draws_version": (_DRAWS_VERSION if anisotropy_radius is None
                                else _OM_DRAWS_VERSION),
              "n_clusters": n_cl, "batch_size": int(batch_size),
              "num_points": int(num_points),
              # 0.0 = ergodic/isotropic (also the default for files from
              # before the knob existed)
              "r_a": (0.0 if anisotropy_radius is None
                      else float(anisotropy_radius)),
              # the partitioned program rounds ~1 ulp differently, so a
              # resume must re-run under the same ens-axis layout for
              # the splice to be bit-faithful
              "mesh_ens": 0 if mesh is None else int(mesh.shape["ens"]),
              # the gravity law shapes every field/DF/draw
              "gravity": str(gravity),
              # shard identity: resuming a multihost shard through a
              # plain (or wrong-rank) call would silently compute every
              # other rank's batches into this shard
              "shard_rank": int((_extra_attrs or {}).get("shard_rank", 0)),
              "shard_count": int((_extra_attrs or {}).get("shard_count",
                                                          1)),
              "key_data": np.asarray(jax.random.key_data(key)).ravel()}
    if full:
        for s, n in counts.items():
            config[f"n_{s}_per_cluster"] = n
    else:
        config["n_particles_per_cluster"] = int(n_particles_per_cluster)

    _stream_batched_catalog(path, resuming, config, _extra_attrs,
                            expected, "cluster", n_cl, batch_size,
                            _only_batches, _dispatch, write)
    return str(path)


def _stream_batched_catalog(path, resuming, config, extra_attrs, expected,
                            group_prefix, n_items, batch_size,
                            only_batches, dispatch, write):
    """The shared streaming loop of every datagen product: config
    record/validation, crash-resume batch markers, and the overlapped
    schedule (batch k+1 is dispatched asynchronously BEFORE batch k's
    blocking device-to-host transfer and raw writes).  Factored out of
    :func:`ensemble_datagen` so :func:`~.mergers.merger_datagen` shares
    the exact resume semantics (and their tests).

    ``dispatch(b0)`` returns the tuple ``write(f, b0, *rest)`` consumes;
    groups are named ``{group_prefix}_{index:06d}``."""
    import h5py

    from ..core.logging import mylog

    with h5py.File(path, "a" if resuming else "w") as f:
        if resuming:
            if bool(f.attrs.get("complete", False)):
                mylog.info("Catalog %s is already complete.", path)
                return
            # shard identity defaults for files written before it was
            # recorded: a plain run's values (mesh_ens joined the merger
            # config in round 5; ensemble files always carried it)
            defaults = {"shard_rank": 0, "shard_count": 1, "r_a": 0.0,
                        "mesh_ens": 0, "gravity": "newtonian"}
            for k, v in config.items():
                have = f.attrs.get(k, defaults.get(k))
                if have is None or not np.array_equal(have, v):
                    raise ValueError(
                        f"resume config mismatch on {k!r}: file has "
                        f"{have!r}, this run asks {v!r} — resuming "
                        "would splice incompatible draws")
        else:
            for k, v in config.items():
                f.attrs[k] = v
            for k, v in (extra_attrs or {}).items():
                f.attrs[k] = v
            f.attrs["units"] = "kpc, kpc/Myr, Msun (galactic)"
            f.attrs["_batches_done"] = np.zeros((0,), np.int64)
        if resuming and "_batches_done" in f.attrs:
            done = set(np.asarray(f.attrs["_batches_done"]).tolist())
        elif resuming:  # pre-marker file: presence is the best we have
            mylog.warning(
                "%s predates the _batches_done marker; falling back to "
                "dataset-presence completion checks (cannot detect a "
                "crash inside a batch's raw write window)", path)
            done = None
        else:
            done = set()

        def _mark(b0_done):
            # AFTER raw.flush() returned: the batch's bytes are in the
            # file.  The marker write is what makes it count on resume.
            if done is not None:
                done.add(int(b0_done))
                f.attrs["_batches_done"] = np.asarray(sorted(done),
                                                      np.int64)

        todo = []
        mine = (range(0, n_items, batch_size) if only_batches is None
                else sorted(only_batches))
        for b0 in mine:
            names = [f"{group_prefix}_{i:06d}"
                     for i in range(b0, min(b0 + batch_size, n_items))]
            have_all = all(nm in f and all(ds in f[nm] for ds in expected)
                           for nm in names)
            if resuming and have_all and (done is None or b0 in done):
                continue
            if resuming:
                for nm in names:  # drop the partial batch, recompute it
                    if nm in f:
                        del f[nm]
            todo.append(b0)
        if resuming:
            mylog.info("Resuming %s: %d/%d batches already complete.",
                       path, len(mine) - len(todo), len(mine))
        pending = None
        for b0 in todo:
            nxt = (b0, *dispatch(b0))  # async dispatch BEFORE the write
            if pending is not None:
                write(f, *pending)
                _mark(pending[0])
            pending = nxt
        if pending is not None:
            write(f, *pending)
            _mark(pending[0])
        f.attrs["complete"] = True


def ensemble_datagen_multihost(M200, conc, filename,
                               n_particles_per_cluster, batch_size=256,
                               num_points=512, key=None, overwrite=False,
                               resume=False, mesh=None,
                               anisotropy_radius=None, gravity="newtonian",
                               aot_dir=None,
                               prime_aot=False, rank=None, nproc=None):
    """Multi-process :func:`ensemble_datagen`: process ``rank`` of
    ``nproc`` computes batches ``rank, rank+nproc, ...`` (strided, so
    the tail balances) and writes its cluster groups — GLOBAL indices —
    to ``<stem>.<rank>of<nproc><suffix>``.

    Datagen has no cross-cluster coupling and keys fold on the global
    batch offset, so the shard set is **bit-identical** to what one
    process would have written: no coordinator, no collectives — every
    process just needs its rank (defaults to
    ``jax.process_index()``/``jax.process_count()`` under
    ``jax.distributed``; pass them explicitly otherwise, e.g. from a
    job scheduler).  Feed the shard list straight to
    :func:`read_catalog` / :func:`catalog_batches`, which accept a
    sequence of filenames and reassemble the global index space.

    ``resume=True`` resumes this process's shard independently.
    Returns this process's shard filename.
    """
    import pathlib

    if rank is None:
        rank = jax.process_index()
    if nproc is None:
        nproc = jax.process_count()
    if not 0 <= rank < nproc:
        raise ValueError(f"rank {rank} outside [0, {nproc})")
    path = pathlib.Path(filename)
    shard = path.with_name(f"{path.stem}.{rank}of{nproc}{path.suffix}")
    n_cl = int(jnp.asarray(M200).shape[0])
    mine = [b0 for i, b0 in enumerate(range(0, n_cl, batch_size))
            if i % nproc == rank]
    return ensemble_datagen(
        M200, conc, str(shard), n_particles_per_cluster,
        batch_size=batch_size, num_points=num_points, key=key,
        overwrite=overwrite, resume=resume, mesh=mesh,
        anisotropy_radius=anisotropy_radius, gravity=gravity,
        aot_dir=aot_dir,
        prime_aot=prime_aot, _only_batches=mine,
        _extra_attrs={"shard_rank": rank, "shard_count": nproc})


def datagen_batches(M200, conc, n_particles_per_cluster, batch_size=256,
                    num_points=512, key=None, mesh=None,
                    anisotropy_radius=None):
    """Yield ``(b0, batch_out)`` draws directly as device arrays — the
    no-disk streaming form of :func:`ensemble_datagen` for consumers
    that train on the draws immediately (catalog write + read-back
    skipped entirely).

    ``batch_out`` is exactly the batch program's output: for an int
    count, ``(positions, velocities, particle_masses)`` with leading
    batch axis; for a species dict, ``{"dm": (pos, vel, pmass),
    "star": (pos, vel, pmass), "gas": (pos, energy, pmass)}``.  Batch
    k+1 is dispatched asynchronously before batch k is yielded, so
    host-side consumption overlaps device compute — the same overlap
    :func:`ensemble_datagen` uses for its writes.

    Draws are identical to what :func:`ensemble_datagen` writes for the
    same (key, batch_size, num_points): keys fold on the batch offset.
    """
    M200 = jnp.asarray(M200, jnp.float64)
    conc = jnp.asarray(conc, jnp.float64)
    n_cl = int(M200.shape[0])
    if key is None:
        key = jax.random.key(0)
    _, _, batch_fn = _resolve_batch_fn(n_particles_per_cluster, num_points,
                                       r_a=anisotropy_radius)
    _dispatch = _make_dispatch(M200, conc, batch_fn, batch_size, key, mesh)
    pending = None
    for b0 in range(0, n_cl, batch_size):
        nxt = (b0, _dispatch(b0)[2])  # async dispatch before the yield
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending


def read_catalog(filename, indices=None, fields=None):
    """Iterate ``(index, cluster_dict)`` over an :func:`ensemble_datagen`
    catalog.

    ``cluster_dict`` maps every dataset name in the cluster's group
    (``dm_position`` / ``particle_velocity`` / ... depending on the
    product form) to its array, plus the group attrs (``M200``, ``conc``,
    per-species particle masses).  Reads go through the raw
    pread-at-offset path (core/h5raw.RawReader) — parity with H5Dread
    on a healthy host, up to ~6x when HDF5's read path degrades
    (benchmarks/bench_catalog_io.py measures both).

    ``indices``: optional iterable of cluster indices (default: all, in
    order).

    ``fields``: optional iterable of dataset names to read (default:
    all) — a consumer training on positions alone shouldn't pay the
    bandwidth for velocities.  Attrs are always included; unknown names
    raise (a typo would otherwise silently yield partial clusters).

    ``filename`` may be a sequence of filenames — the shard set of an
    :func:`ensemble_datagen_multihost` run; cluster indices are global
    across the set (each group name appears in exactly one shard)."""
    import contextlib

    filenames = _catalog_filenames(filename)
    with contextlib.ExitStack() as stack:
        files, readers, n_cl, where = _open_catalog(stack, filenames)
        if indices is None:
            indices = range(n_cl)
        if fields is not None:
            fields = list(fields)
        for i in indices:
            yield int(i), _read_cluster(files, readers, where, int(i),
                                        fields, filenames)


def _catalog_filenames(filename):
    """Normalize the filename-or-shard-sequence argument ONCE — a
    one-shot iterable (e.g. ``glob.iglob``) consumed twice would leave
    the second consumer an empty list."""
    if isinstance(filename, (str, os.PathLike)):
        return [str(filename)]
    return [str(fn) for fn in filename]


def _open_catalog(stack, filenames, prefix="cluster"):
    """Open a catalog's shard files + raw readers on ``stack`` and build
    the cluster-group -> shard map (each group lives in exactly one
    shard).  The map walk is O(total groups) — do it once per consumer
    call, not once per batch."""
    import h5py

    from ..core.h5raw import RawReader

    files = [stack.enter_context(h5py.File(fn, "r")) for fn in filenames]
    readers = [stack.enter_context(RawReader(f)) for f in files]
    n_cl = int(files[0].attrs["n_clusters"])
    where = {name: j for j, f in enumerate(files) for name in f
             if name.startswith(prefix + "_")}
    return files, readers, n_cl, where


def _read_cluster(files, readers, where, i, fields, filenames,
                  prefix="cluster"):
    name = f"{prefix}_{int(i):06d}"
    j = where.get(name)
    if j is None:
        raise KeyError(
            f"{name} missing from {filenames}: incomplete "
            "catalog (interrupted run?) — finish it with "
            "the datagen's resume=True")
    g = files[j][name]
    if fields is not None:
        missing = [k for k in fields if k not in g]
        if missing:
            raise KeyError(
                f"fields {missing} not in cluster group "
                f"(has {sorted(g)})")
    out = {k: readers[j].read(g[k])
           for k in (g if fields is None else fields)}
    out.update(g.attrs)
    return out


def catalog_batches(filename, batch_size, key=None, drop_remainder=True,
                    prefetch=True, fields=None):
    """Iterate an :func:`ensemble_datagen` catalog in stacked batches —
    the training-loop consumption form of the datagen product.

    Yields one dict per batch: every per-cluster dataset stacked on a
    leading batch axis (e.g. ``dm_position`` -> ``(B, n_dm, 3)``) and
    every group attr stacked to ``(B,)`` (``M200``, ``conc``, the
    per-species particle masses).  All clusters in a catalog share
    per-dataset shapes (``ensemble_datagen`` draws fixed per-cluster
    counts), so the stack is well-defined; arrays are host numpy —
    feed them to ``jnp.asarray``/``device_put`` in the consumer.

    ``key``: optional ``jax.random`` key — shuffles the cluster order
    (a new permutation per epoch = a new fold of the key).  ``None``
    iterates in catalog order.

    ``drop_remainder``: drop the final short batch (default True) so
    every yielded batch has the same shape — one jit compilation in the
    consumer.

    ``prefetch``: read batch k+1 on a background thread while batch k
    is being consumed (reads run ~1 GB/s warm on this host,
    benchmarks/bench_catalog_io.py; the overlap hides them behind
    device compute).

    ``fields``: optional dataset-name subset to read (attrs always
    included) — see :func:`read_catalog`.  Like there, ``filename``
    may be an :func:`ensemble_datagen_multihost` shard list.

    The reference has no counterpart — its per-cluster product ends at
    simulation-code files; batched catalog consumption is the rebuild's
    ensemble-scale product (SURVEY §2.3 / BASELINE ensemble-datagen row).
    """
    import contextlib

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    filenames = _catalog_filenames(filename)
    # files and the group->shard map live for the whole iteration: one
    # open + one O(n_cl) map walk per call, not one per batch
    with contextlib.ExitStack() as stack:
        files, readers, n_cl, where = _open_catalog(stack, filenames)
        fieldlist = None if fields is None else list(fields)
        order = np.arange(n_cl)
        if key is not None:
            order = np.asarray(jax.random.permutation(key, n_cl))
        limit = n_cl - (n_cl % batch_size) if drop_remainder else n_cl
        batches = [order[i:i + batch_size]
                   for i in range(0, limit, batch_size)]

        def _read(idx):
            clusters = [_read_cluster(files, readers, where, int(i),
                                      fieldlist, filenames) for i in idx]
            return {k: np.stack([cl[k] for cl in clusters])
                    for k in clusters[0]}

        if not prefetch:
            for b in batches:
                yield _read(b)
            return
        from concurrent.futures import ThreadPoolExecutor

        # single worker: reads are serialized (h5py objects are used by
        # at most one thread at a time), batch k+1 reads while the
        # consumer works on batch k
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = None
            for b in batches:
                nxt = ex.submit(_read, b)
                if fut is not None:
                    yield fut.result()
                fut = nxt
            if fut is not None:
                yield fut.result()


from .qa import QA_TOLERANCES as _QA


def verify_catalog(filename, indices=None, strict=True,
                   speed_tol=_QA["speed_tol"],
                   energy_rtol=_QA["cluster"]["energy_rtol"],
                   radius_tol=_QA["cluster"]["radius_tol"],
                   mass_rtol=_QA["cluster"]["mass_rtol"],
                   zero_row_tol=_QA["zero_row_tol"]):
    """Physics QA gate for datagen catalogs — the check a training
    pipeline runs before trusting a dataset.  Default tolerances and
    their rationale live in :mod:`~.qa` (shared with the merger gate).

    For each checked cluster the equilibrium model is REBUILT from the
    recorded ``(M200, conc, num_points)`` attrs and the stored draws are
    checked against it:

    * every dataset is finite;
    * datasets are not zero-filled: more than ``zero_row_tol`` of a
      species' radii exactly zero, or an all-zero collisionless
      velocity block, means unwritten file extents (a crash inside the
      raw write window materializes every dataset of a batch before
      its bytes land; :func:`ensemble_datagen`'s ``_batches_done``
      marker prevents *resume* from keeping such batches, and this
      check catches them in any file regardless of provenance).  A
      legitimate draw CAN yield r = 0 exactly (the sampling CDF starts
      at r = 0 and an f32 uniform hits 0 with p ~ 6e-8), so single
      zero rows are tolerated;
    * particle radii lie inside the model's radial grid (± radius_tol);
    * collisionless speeds do not exceed the local escape speed
      ``sqrt(2 psi(r))`` by more than ``speed_tol`` (the draws use f32
      node-lerped tables, so exact-psi comparisons carry lerp error);
    * gas thermal energies match ``1.5 P / rho`` interpolated at the
      particle radius within ``energy_rtol``;
    * per-species particle masses reproduce the species' total grid mass
      (``n_part * pmass == M_sp(r_max)``) within ``mass_rtol``.

    Returns a report dict (max observed deviations + a ``violations``
    list); ``strict=True`` additionally raises ``ValueError`` when any
    check fails.  ``filename`` may be a shard list.  The reference has
    no analogous data-QA tool; the closest is its ``check_virial``
    (reference virial.py:78-106), which validates the DF, not drawn
    catalogs."""
    import h5py

    filenames = _catalog_filenames(filename)
    with h5py.File(filenames[0], "r") as f:
        product = f.attrs.get("product")
        num_points = int(f.attrs["num_points"])
        n_cl = int(f.attrs["n_clusters"])
        r_a = float(f.attrs.get("r_a", 0.0))  # 0 = ergodic/isotropic
        gravity = str(f.attrs.get("gravity", "newtonian"))
    if product == "merger_scenes":
        # merger catalogs carry scene_ groups and per-halo segments —
        # the merger verifier rebuilds every halo and checks the
        # density-weighted gas mixing too (lazy import: mergers imports
        # this module at load time)
        from .mergers import verify_merger_catalog

        # the merger recompute's method floors differ from the
        # single-cluster gate's (qa.QA_TOLERANCES has the rationale) —
        # clamp to its defaults so the generic entry point never
        # false-fails a healthy catalog
        mt = _QA["merger"]
        return verify_merger_catalog(
            filename, indices=indices, speed_tol=speed_tol,
            energy_rtol=max(energy_rtol, mt["energy_rtol"]),
            mass_rtol=max(mass_rtol, mt["mass_rtol"]),
            radius_tol=max(radius_tol, mt["radius_tol"]),
            zero_row_tol=zero_row_tol, strict=strict)
    if indices is None:
        indices = range(n_cl)
    indices = list(indices)

    report = {"n_clusters_checked": 0, "n_particles_checked": 0,
              "max_speed_frac": 0.0, "max_energy_rel_err": 0.0,
              "max_radius_frac": 0.0, "min_radius_frac": np.inf,
              "max_mass_rel_err": 0.0,
              "violations": []}
    species_mass = {"dm": "dark_matter_mass", "star": "stellar_mass",
                    "gas": "gas_mass"}

    def _check(cond, msg):
        if not cond:
            report["violations"].append(msg)

    # one jitted rebuild program reused across the loop (traces once),
    # under the catalog's recorded gravity law — the v_esc and energy
    # checks are meaningless against the wrong law (and fail loudly on
    # a mislabeled catalog: MOND draws exceed the Newtonian escape
    # speed near r_max)
    build_fn = jax.jit(lambda m, c: build_one_cluster(
        m, c, num_points=num_points, with_df=False, gravity=gravity))

    for i, cl in read_catalog(filenames, indices=indices):
        f = build_fn(cl["M200"], cl["conc"])
        rr = np.asarray(f["radius"])
        psi = -np.asarray(f["gravitational_potential"])
        e_grid = 1.5 * np.asarray(f["pressure"]) / np.asarray(f["density"])
        if "particle_position" in cl:  # DM-only product
            triples = [("dm", cl["particle_position"],
                        cl["particle_velocity"], cl["particle_mass"])]
            gas = None
        else:
            triples = [(sp, cl[f"{sp}_position"], cl[f"{sp}_velocity"],
                        cl[f"particle_mass_{sp}"])
                       for sp in ("dm", "star") if f"{sp}_position" in cl]
            gas = (cl["gas_position"], cl["gas_thermal_energy"],
                   cl["particle_mass_gas"]) if "gas_position" in cl \
                else None
        for sp, pos, vel, pmass in triples:
            _check(np.isfinite(pos).all() and np.isfinite(vel).all(),
                   f"cluster {i} {sp}: non-finite values")
            r = np.sqrt((np.asarray(pos, np.float64) ** 2).sum(axis=1))
            zfrac = float((r == 0.0).mean())
            _check(zfrac <= zero_row_tol,
                   f"cluster {i} {sp}: {zfrac:.2%} zero-radius rows "
                   "(unwritten file extents?)")
            _check(np.count_nonzero(vel) > 0,
                   f"cluster {i} {sp}: all-zero velocities "
                   "(unwritten file extents?)")
            report["min_radius_frac"] = min(report["min_radius_frac"],
                                            float(r.min() / rr[-1]))
            rfrac = float(r.max() / rr[-1])
            report["max_radius_frac"] = max(report["max_radius_frac"],
                                            rfrac)
            _check(rfrac <= 1.0 + radius_tol,
                   f"cluster {i} {sp}: radius {rfrac:.6f} of r_max")
            v = np.sqrt((np.asarray(vel, np.float64) ** 2).sum(axis=1))
            v_esc = np.sqrt(2.0 * np.interp(r, rr, psi))
            frac = float((v / v_esc).max())
            report["max_speed_frac"] = max(report["max_speed_frac"], frac)
            _check(frac <= 1.0 + speed_tol,
                   f"cluster {i} {sp}: speed {frac:.6f} of local v_esc")
            if r_a > 0.0:
                # OM anisotropy: drawn beta in a shell around r_a must
                # track beta_OM = r^2/(r^2 + r_a^2) (statistical check;
                # an isotropic draw in an OM-labeled catalog shows
                # beta ~ 0 and fails loudly)
                nh = np.asarray(pos, np.float64) / np.maximum(
                    r, 1e-30)[:, None]
                v_r = (np.asarray(vel, np.float64) * nh).sum(axis=1)
                shell = (r >= 1.2 * r_a) & (r <= min(2.0 * r_a, rr[-1]))
                if shell.sum() >= 1000:
                    v_t2 = (v[shell] ** 2 - v_r[shell] ** 2)
                    beta = 1.0 - v_t2.mean() / (2.0 * (v_r[shell] ** 2)
                                                .mean())
                    rmid = float(r[shell].mean())
                    b_om = rmid**2 / (rmid**2 + r_a**2)
                    _check(abs(beta - b_om) < 0.15,
                           f"cluster {i} {sp}: anisotropy beta "
                           f"{beta:.3f} vs OM {b_om:.3f} at r~{rmid:.0f}"
                           " (isotropic draws in an OM catalog?)")
            m_tot = float(np.asarray(f[species_mass[sp]])[-1])
            merr = abs(float(pmass) * len(r) - m_tot) / m_tot
            report["max_mass_rel_err"] = max(report["max_mass_rel_err"],
                                             merr)
            _check(merr <= mass_rtol,
                   f"cluster {i} {sp}: mass budget off by {merr:.2e}")
            report["n_particles_checked"] += len(r)
        if gas is not None:
            pos, energy, pmass = gas
            _check(np.isfinite(pos).all() and np.isfinite(energy).all(),
                   f"cluster {i} gas: non-finite values")
            r = np.sqrt((np.asarray(pos, np.float64) ** 2).sum(axis=1))
            zfrac = float((r == 0.0).mean())
            _check(zfrac <= zero_row_tol,
                   f"cluster {i} gas: {zfrac:.2%} zero-radius rows "
                   "(unwritten file extents?)")
            report["min_radius_frac"] = min(report["min_radius_frac"],
                                            float(r.min() / rr[-1]))
            e_ref = np.interp(r, rr, e_grid)
            rel = float((np.abs(np.asarray(energy, np.float64) - e_ref)
                         / e_ref).max())
            report["max_energy_rel_err"] = max(
                report["max_energy_rel_err"], rel)
            _check(rel <= energy_rtol,
                   f"cluster {i} gas: thermal energy off by {rel:.3e}")
            _check((np.asarray(energy) > 0).all(),
                   f"cluster {i} gas: non-positive thermal energy")
            m_tot = float(np.asarray(f["gas_mass"])[-1])
            merr = abs(float(pmass) * len(r) - m_tot) / m_tot
            report["max_mass_rel_err"] = max(report["max_mass_rel_err"],
                                             merr)
            _check(merr <= mass_rtol,
                   f"cluster {i} gas: mass budget off by {merr:.2e}")
            report["n_particles_checked"] += len(r)
        report["n_clusters_checked"] += 1

    if strict and report["violations"]:
        raise ValueError("catalog failed physics QA:\n  "
                         + "\n  ".join(report["violations"][:20]))
    return report


def catalog_to_particles(filename, index):
    """Load one catalog cluster as a
    :class:`~cluster_generator_tpu.particles.ClusterParticles` — the
    bridge from datagen catalogs to the exporter stack (Gadget/AREPO
    files, combines, resampling).

    Handles every catalog form: the full-species product maps
    ``dm/gas/star`` datasets to per-type position/velocity/mass fields
    (gas gets its thermal energy and zero velocities — the catalogs
    store HSE clusters); the DM-only product maps to one ``dm`` type;
    merger-scene catalogs dispatch to
    :func:`~.mergers.scene_to_particles` on the ``product`` attr.

    Catalog positions are ORIGIN-centered; Gadget boxes span
    [0, box_size], so place the cluster before exporting, e.g.
    ``p.add_offsets([box/2]*3, v_bulk)`` (the writer warns loudly when
    it clips out-of-box particles)."""
    import h5py

    from ..particles import ClusterParticles

    with h5py.File(_catalog_filenames(filename)[0], "r") as f:
        if f.attrs.get("product") == "merger_scenes":
            from .mergers import scene_to_particles

            return scene_to_particles(filename, index)
    (_, cl), = read_catalog(filename, indices=[index])
    fields = {}
    if "particle_position" in cl:  # DM-only product
        n = cl["particle_position"].shape[0]
        fields["dm", "particle_position"] = cl["particle_position"]
        fields["dm", "particle_velocity"] = cl["particle_velocity"]
        fields["dm", "particle_mass"] = np.full(
            n, cl["particle_mass"], dtype=np.float32)
        return ClusterParticles.from_fields(fields)
    for sp in ("dm", "gas", "star"):
        pos = cl.get(f"{sp}_position")
        if pos is None:
            continue
        n = pos.shape[0]
        fields[sp, "particle_position"] = pos
        vel = cl.get(f"{sp}_velocity")
        fields[sp, "particle_velocity"] = (
            vel if vel is not None
            else np.zeros_like(pos))  # gas: HSE, no bulk motion
        fields[sp, "particle_mass"] = np.full(
            n, cl[f"particle_mass_{sp}"], dtype=np.float32)
        if sp == "gas":
            fields[sp, "thermal_energy"] = cl["gas_thermal_energy"]
    return ClusterParticles.from_fields(fields)
