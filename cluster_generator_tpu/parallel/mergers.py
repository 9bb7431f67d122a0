"""Merger-scene ensemble datagen: batched binary (or 1-3 halo) merger
ICs streamed to one HDF5 catalog — training data for merger emulators.

The reference's merger product is ONE scene at a time
(``ClusterICs.setup_particle_ics``, ics.py:323-375: per-halo particle
generation + ``combine_two_clusters``); this module ``vmap``s the fused
single-program merger pipeline (:func:`~..pipeline.merger_ic_fused` —
equilibrium models, Eddington DFs, speed/radius tables, and every
particle draw of the scene in one XLA program) over a scene PARAMETER
ensemble, so a thousand merger ICs are a handful of device launches.
The catalog machinery (crash-resume batch markers, raw pwrite streaming
overlapped with device compute, multi-process shards) is shared with the
single-cluster product (:func:`~.ensemble._stream_batched_catalog`).

Scene layout per group ``scene_%06d``:

* datasets (f32): ``gas_position / gas_velocity / gas_thermal_energy /
  gas_density`` (density-weighted mixing across halos, reference
  particles.py:587-639), ``dm_position / dm_velocity``,
  ``star_position / star_velocity`` — each concatenated over halos in
  halo order with the STATIC per-halo counts recorded in the file attrs
  (``n_<species>_per_halo``), so consumers can attribute any particle to
  its halo by contiguous segments;
* attrs: ``M200 / conc`` (per-halo), ``center / bulk_velocity``
  ((H, 3)), ``particle_mass_<species>`` (per-halo — every particle of
  one halo's species carries equal mass, reference model.py:917).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core.h5raw import RawWriter
from .ensemble import (
    _catalog_filenames,
    _open_catalog,
    _read_cluster,
    _speed_table_key,
    _stream_batched_catalog,
)

__all__ = ["sample_merger_scene_params", "binary_scene_geometry",
           "triple_scene_geometry", "sample_triple_scene_params",
           "halo_mass_weights", "merger_datagen",
           "merger_datagen_multihost", "read_merger_catalog",
           "verify_merger_catalog", "scene_to_particles"]

# Bump whenever the MEANING of the merger draws changes for fixed config
# (see ensemble._DRAWS_VERSION for the contract).  1 = the r4 product:
# pipeline.sample_merger_ic draw scheme (paired-table radius/speed
# gathers, Bernoulli joint-row selection, at-radius gas mixing).
# 2 = r5: star speed tables at the ensemble product's coarse
# resolutions (build_speed_tables star_n_rows=64/n_s<=256/n_q<=256 —
# the cfg6 stage attribution put full-resolution star tables at ~20%
# of the warm scene cost for ~10% of the draws).
_MERGER_DRAWS_VERSION = 2


def sample_merger_scene_params(key, n, logM_range=(14.2, 15.3),
                               mass_ratio_range=(0.2, 1.0),
                               conc_range=(3.0, 8.0),
                               d_range=(2000.0, 4000.0),
                               b_frac_range=(0.0, 0.5),
                               v_rel_range=(0.5, 1.5)):
    """Draw ``n`` binary-merger scene parameters.

    Primary mass from log-uniform ``logM_range``; secondary by a uniform
    mass ratio; concentrations from the same c(M) relation + scatter as
    :func:`~.ensemble.sample_ensemble_params`; separation ``d`` (kpc)
    uniform; impact parameter ``b = frac * d`` with ``frac`` uniform in
    ``b_frac_range`` (the reference's binary geometry takes (d, b)
    directly, ics.py:22-57); relative speed ``v_rel`` (kpc/Myr,
    1 kpc/Myr = 977.8 km/s) uniform.

    Returns a dict of f64 arrays: ``M200 (n, 2), conc (n, 2), d (n,),
    b (n,), v_rel (n,)`` — feed to :func:`binary_scene_geometry` +
    :func:`merger_datagen`.
    """
    ks = jax.random.split(key, 6)
    f64 = jnp.float64
    logM = jax.random.uniform(ks[0], (n,), f64, *logM_range)
    M1 = 10.0 ** logM
    ratio = jax.random.uniform(ks[1], (n,), f64, *mass_ratio_range)
    M2 = ratio * M1
    M200 = jnp.stack([M1, M2], axis=1)
    c_mean = 5.0 * (M200 / 1.0e15) ** (-0.1)
    scatter = jax.random.normal(ks[2], (n, 2), f64) * 0.3
    conc = jnp.clip(c_mean * jnp.exp(scatter), *conc_range)
    d = jax.random.uniform(ks[3], (n,), f64, *d_range)
    b = d * jax.random.uniform(ks[4], (n,), f64, *b_frac_range)
    v_rel = jax.random.uniform(ks[5], (n,), f64, *v_rel_range)
    return {"M200": M200, "conc": conc, "d": d, "b": b, "v_rel": v_rel}


def binary_scene_geometry(M200, d, b, v_rel, center=(0.0, 0.0, 0.0)):
    """Scene geometry for binary mergers: centers separated by ``d``
    with impact parameter ``b`` (the reference's
    ``compute_centers_for_binary`` construction, ics.py:22-57 — the
    along-axis component is ``sqrt(d^2 - b^2)`` so the total separation
    is exactly ``d``), approach velocities along +/-x with relative
    speed ``v_rel`` split mass-weighted so the scene is in its
    ZERO-MOMENTUM frame (the reference leaves the split to the user;
    the momentum-free frame is what simulation codes want).

    Returns ``(centers (n, 2, 3), velocities (n, 2, 3))`` f64.
    """
    M200 = np.asarray(M200, np.float64).reshape(-1, 2)
    d = np.asarray(d, np.float64)
    b = np.asarray(b, np.float64)
    v_rel = np.asarray(v_rel, np.float64)
    if np.any(b > d):
        raise ValueError("impact parameter b exceeds separation d")
    n = M200.shape[0]
    dx = np.sqrt(d * d - b * b)
    diff = np.stack([dx, b, np.zeros_like(d)], axis=1)        # (n, 3)
    center = np.asarray(center, np.float64)
    centers = np.stack([center - 0.5 * diff, center + 0.5 * diff], axis=1)
    # zero total momentum: m1 v1 + m2 v2 = 0 with v1 - v2 = v_rel x_hat
    w1 = M200[:, 1] / M200.sum(axis=1)                        # m2 / (m1+m2)
    vel = np.zeros((n, 2, 3))
    vel[:, 0, 0] = +v_rel * w1
    vel[:, 1, 0] = -v_rel * (1.0 - w1)
    return centers, vel


def triple_scene_geometry(M200, d12, b12, v12, d3, b3, v3,
                          center=(0.0, 0.0, 0.0)):
    """Scene geometry for 3-halo mergers (the reference's three-cluster
    composition, ics.py ``num_halos=3`` + particles.py:669
    ``combine_three_clusters``, which takes explicit centers; this helper
    supplies the geometry the reference leaves to the user).

    Halos 1 and 2 form a binary along x with separation ``d12``, impact
    parameter ``b12`` (along y) and relative speed ``v12`` — exactly
    :func:`binary_scene_geometry`.  Halo 3 sits at distance ``d3`` from
    the pair's center of mass ALONG +y with impact parameter ``b3``
    along z, falling toward the center of mass with speed ``v3``
    (late-infall configuration).  The whole scene is then shifted to its
    zero-momentum frame.

    Returns ``(centers (n, 3, 3), velocities (n, 3, 3))`` f64.
    """
    M200 = np.asarray(M200, np.float64).reshape(-1, 3)
    c12, v12v = binary_scene_geometry(M200[:, :2], d12, b12, v12)
    d3 = np.asarray(d3, np.float64)
    b3 = np.asarray(b3, np.float64)
    v3 = np.asarray(v3, np.float64)
    if np.any(b3 > d3):
        raise ValueError("impact parameter b3 exceeds separation d3")
    n = M200.shape[0]
    # pair center of mass (halo-1/2 centers are symmetric about origin)
    w = M200[:, :2] / M200[:, :2].sum(axis=1, keepdims=True)  # (n, 2)
    com12 = (w[:, :, None] * c12).sum(axis=1)                 # (n, 3)
    dy = np.sqrt(d3 * d3 - b3 * b3)
    c3 = com12 + np.stack([np.zeros_like(d3), dy, b3], axis=1)
    vel3 = np.zeros((n, 3))
    vel3[:, 1] = -v3                                          # infall (-y)
    centers = np.concatenate([c12, c3[:, None, :]], axis=1)   # (n, 3, 3)
    vel = np.concatenate([v12v, vel3[:, None, :]], axis=1)
    # shift to the scene's zero-momentum frame
    wall = M200 / M200.sum(axis=1, keepdims=True)             # (n, 3)
    vel = vel - (wall[:, :, None] * vel).sum(axis=1, keepdims=True)
    ctr = np.asarray(center, np.float64)
    return centers + ctr, vel


def sample_triple_scene_params(key, n, logM_range=(14.2, 15.3),
                               mass_ratio_range=(0.2, 1.0),
                               conc_range=(3.0, 8.0),
                               d_range=(2000.0, 4000.0),
                               b_frac_range=(0.0, 0.5),
                               v_rel_range=(0.5, 1.5),
                               d3_range=(3000.0, 5000.0),
                               v3_range=(0.3, 1.0)):
    """Draw ``n`` 3-halo merger-scene parameters: primary mass
    log-uniform, halos 2 and 3 by independent uniform mass ratios,
    concentrations from the same c(M) relation + scatter as the binary
    sampler, binary geometry from ``d/b_frac/v_rel`` ranges, third-halo
    infall from ``d3/b_frac/v3`` ranges.  Returns a params dict with
    explicit ``centers``/``velocities`` — feed straight to
    :func:`merger_datagen`."""
    ks = jax.random.split(key, 10)
    f64 = jnp.float64
    logM = jax.random.uniform(ks[0], (n,), f64, *logM_range)
    M1 = 10.0 ** logM
    r2 = jax.random.uniform(ks[1], (n,), f64, *mass_ratio_range)
    r3 = jax.random.uniform(ks[2], (n,), f64, *mass_ratio_range)
    M200 = jnp.stack([M1, r2 * M1, r3 * M1], axis=1)
    c_mean = 5.0 * (M200 / 1.0e15) ** (-0.1)
    scatter = jax.random.normal(ks[3], (n, 3), f64) * 0.3
    conc = jnp.clip(c_mean * jnp.exp(scatter), *conc_range)
    d12 = jax.random.uniform(ks[4], (n,), f64, *d_range)
    b12 = d12 * jax.random.uniform(ks[5], (n,), f64, *b_frac_range)
    v12 = jax.random.uniform(ks[6], (n,), f64, *v_rel_range)
    d3 = jax.random.uniform(ks[7], (n,), f64, *d3_range)
    b3 = d3 * jax.random.uniform(ks[8], (n,), f64, *b_frac_range)
    v3 = jax.random.uniform(ks[9], (n,), f64, *v3_range)
    centers, velocities = triple_scene_geometry(M200, d12, b12, v12,
                                                d3, b3, v3)
    return {"M200": M200, "conc": conc, "centers": centers,
            "velocities": velocities}


def _split_by_weights(total, weights):
    """Split ``total`` into per-halo ints proportional to ``weights``
    (largest-remainder rounding, so the parts sum exactly)."""
    w = np.asarray(weights, np.float64)
    exact = total * w / w.sum()
    parts = np.floor(exact).astype(int)
    rem = int(total - parts.sum())
    order = np.argsort(-(exact - parts))
    parts[order[:rem]] += 1
    return tuple(int(x) for x in parts)


def halo_mass_weights(M200):
    """Ensemble-mean per-halo mass fractions of a scene-parameter array
    ``M200 (n_scenes, H)`` — the static-shape stand-in for the
    reference's per-scene proration (ics.py:100-160
    ``_determine_num_particles``, which pro-rates each species' total
    count by the per-halo mass fraction).  The batched product needs ONE
    count layout per catalog (static shapes), so int counts are split by
    the mean fraction: a 5:1 merger ensemble then gives both halos the
    same per-particle mass on average, instead of the secondary getting
    5x the mass resolution (the round-4 even-split default)."""
    M200 = np.asarray(M200, np.float64).reshape(-1, M200.shape[-1])
    frac = M200 / M200.sum(axis=1, keepdims=True)
    return frac.mean(axis=0)


def _normalize_counts(counts, H, weights=None):
    """Per-species per-halo static counts.  Dict values may be an int —
    split across halos by ``weights`` (mass-prorated; even when None) —
    or an explicit length-H tuple.  Unknown species raise (a typo would
    silently drop the species from the catalog)."""
    unknown = set(counts) - {"dm", "gas", "star"}
    if unknown:
        raise ValueError(f"unknown species {sorted(unknown)} in counts; "
                         "expected keys from {'dm', 'gas', 'star'}")
    out = {}
    for sp in ("gas", "dm", "star"):
        c = counts.get(sp, 0)
        if isinstance(c, (int, np.integer)):
            out[sp] = _split_by_weights(
                int(c), np.ones(H) if weights is None else weights)
        else:
            c = tuple(int(x) for x in c)
            if len(c) != H:
                raise ValueError(f"counts[{sp!r}] has {len(c)} entries "
                                 f"for {H} halos")
            out[sp] = c
    if not any(sum(v) for v in out.values()):
        raise ValueError("all species counts are zero")
    return out


def _merger_batch_fn(num_points, n_gas, n_dm, n_star, r_a=None,
                     gravity="newtonian"):
    """Memoized jitted program: one SCENE BATCH of fused merger ICs.

    (M200 (B,H), conc (B,H), centers (B,H,3), velocities (B,H,3),
    r_max (H,), key) -> dict of (B, ...) arrays.  Per-halo particle
    masses are reduced to (B, H) scalars on device (every particle of a
    halo's species has equal mass) so the catalog doesn't ship
    N-length constant arrays over the tunnel.
    """
    return _merger_batch_cached(num_points, n_gas, n_dm, n_star,
                                None if r_a is None else float(r_a),
                                str(gravity), _speed_table_key())


def _segment_offsets(ns):
    """Static start offset of each halo's segment in the concatenated
    per-species arrays (zero-count halos contribute nothing)."""
    offs, tot = [], 0
    for n in ns:
        offs.append(tot if n > 0 else None)
        tot += n
    return offs


@lru_cache(maxsize=16)
def _merger_batch_cached(num_points, n_gas, n_dm, n_star, r_a, gravity,
                         kw_items):
    from ..pipeline import merger_ic_fused

    del kw_items  # participates in the memo key only
    seg = {"gas": _segment_offsets(n_gas), "dm": _segment_offsets(n_dm),
           "star": _segment_offsets(n_star)}

    def _halo_masses(parts, sp):
        pm = parts[sp, "particle_mass"]
        return jnp.stack([pm[o] if o is not None else jnp.zeros((), pm.dtype)
                          for o in seg[sp]])

    def one(m, c, ctr, vel, r_max, k):
        parts, _ = merger_ic_fused.__wrapped__(
            m, c, ctr, vel, r_max, k, n_gas, n_dm, n_star,
            num_points=num_points, r_a=r_a, gravity=gravity)
        out = {}
        if sum(n_gas):
            out["gas_position"] = parts["gas", "particle_position"]
            out["gas_velocity"] = parts["gas", "particle_velocity"]
            out["gas_thermal_energy"] = parts["gas", "thermal_energy"]
            out["gas_density"] = parts["gas", "density"]
            out["mass_gas"] = _halo_masses(parts, "gas")
        for sp, ns in (("dm", n_dm), ("star", n_star)):
            if sum(ns):
                out[f"{sp}_position"] = parts[sp, "particle_position"]
                out[f"{sp}_velocity"] = parts[sp, "particle_velocity"]
                out[f"mass_{sp}"] = _halo_masses(parts, sp)
        return out

    @jax.jit
    def batch(M200, conc, centers, velocities, r_max, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(M200.shape[0]))
        return jax.vmap(one, in_axes=(0, 0, 0, 0, None, 0))(
            M200, conc, centers, velocities, r_max, keys)

    return batch


def _params_sha(M200, conc, centers, velocities):
    """Identity of the scene-parameter arrays for the resume config —
    unlike the single-cluster product, merger params are 8 arrays a
    caller could plausibly regenerate differently; a resume against the
    wrong ensemble must raise, not splice."""
    h = hashlib.sha256()
    for a in (M200, conc, centers, velocities):
        h.update(np.ascontiguousarray(np.asarray(a, np.float64)).tobytes())
    return h.hexdigest()


def merger_datagen(params, filename, counts, batch_size=64,
                   num_points=512, r_max=5000.0, key=None,
                   overwrite=False, resume=False, mesh=None,
                   anisotropy_radius=None, gravity="newtonian",
                   prorate=True, aot_dir=None, prime_aot=False,
                   _only_batches=None, _extra_attrs=None):
    """Stream an ensemble of merger-scene ICs to ONE HDF5 catalog.

    ``params``: dict with ``M200 (B, H)``, ``conc (B, H)`` and either
    ``centers``/``velocities`` ``(B, H, 3)`` explicitly or the binary
    geometry inputs ``d / b / v_rel`` ``(B,)``
    (:func:`binary_scene_geometry` is applied) — the output of
    :func:`sample_merger_scene_params` works as-is.

    ``counts``: ``{"gas": n, "dm": n, "star": n}`` — each an int (split
    across halos by the ensemble-mean mass fraction, the static-shape
    form of the reference's pro-rata rule, ics.py:100-160; pass
    ``prorate=False`` for an even split, or per-halo tuples for full
    control) — static across scenes (one compiled program).
    ``r_max``: sampling radius (kpc), scalar or per-halo.

    ``mesh``: an (ens, part) device mesh (:func:`~.mesh.make_mesh`) —
    each batch's scene parameters are placed sharded over the ``ens``
    axis, same contract as :func:`~.ensemble.ensemble_datagen` (short
    final batches fall back to default placement; the ens size joins
    the resume config).

    ``anisotropy_radius``: Osipkov-Merritt r_a in kpc — collisionless
    species draw from the radially-anisotropic f(Q), as in the
    single-cluster product; recorded in the catalog attrs.

    Scenes are processed in vmapped batches with host writes overlapping
    device compute, crash-resumable with ``resume=True`` — identical
    semantics to :func:`~.ensemble.ensemble_datagen` (shared loop), with
    the scene-parameter arrays' sha256 in the resume config so resuming
    against a different ensemble raises instead of splicing.

    Returns the filename.
    """
    import pathlib

    from ..core.logging import mylog

    path = pathlib.Path(filename)
    if resume and overwrite:
        raise ValueError("resume=True and overwrite=True are mutually "
                         "exclusive")
    resuming = resume and path.exists()
    if path.exists() and not overwrite and not resuming:
        raise IOError(f"{path} exists (pass overwrite=True, or "
                      "resume=True to continue an interrupted run)")
    if anisotropy_radius is not None and not float(anisotropy_radius) > 0.0:
        # same contract (and rationale) as ensemble._resolve_batch_fn:
        # r_a=0 NaN-poisons the draws AND is the catalog attr's isotropic
        # sentinel, so the QA gate would silently skip the beta check
        raise ValueError(f"anisotropy_radius must be positive (got "
                         f"{anisotropy_radius!r}); omit it (None) for "
                         "the isotropic product")
    M200 = jnp.asarray(params["M200"], jnp.float64)
    conc = jnp.asarray(params["conc"], jnp.float64)
    if M200.ndim != 2 or M200.shape != conc.shape:
        raise ValueError("params['M200'] and params['conc'] must both be "
                         f"(n_scenes, n_halos); got {M200.shape} and "
                         f"{conc.shape}")
    n_sc, H = M200.shape
    if "centers" in params:
        centers = np.asarray(params["centers"], np.float64)
        velocities = np.asarray(params["velocities"], np.float64)
    else:
        if H != 2:
            raise ValueError("d/b/v_rel geometry is binary-only; pass "
                             "explicit centers/velocities for H != 2 "
                             "(triple_scene_geometry builds 3-halo "
                             "scenes)")
        centers, velocities = binary_scene_geometry(
            M200, params["d"], params["b"], params["v_rel"])
    if centers.shape != (n_sc, H, 3) or velocities.shape != (n_sc, H, 3):
        raise ValueError("centers/velocities must be (n_scenes, n_halos, "
                         f"3); got {centers.shape} / {velocities.shape}")
    centers = jnp.asarray(centers, jnp.float64)
    velocities = jnp.asarray(velocities, jnp.float64)
    counts = _normalize_counts(
        counts, H, weights=halo_mass_weights(M200) if prorate else None)
    r_max_arr = jnp.broadcast_to(
        jnp.asarray(r_max, jnp.float64).ravel(), (H,))
    if key is None:
        key = jax.random.key(0)
    from ..model.gravity import get_gravity

    get_gravity(gravity)  # unknown law names fail fast, before compile
    batch_fn = _merger_batch_fn(num_points, counts["gas"], counts["dm"],
                                counts["star"], r_a=anisotropy_radius,
                                gravity=gravity)
    mylog.info("Merger datagen: %d scenes x %d halos x %s particles%s "
               "-> %s", n_sc, H, counts,
               "" if anisotropy_radius is None
               else f" (OM r_a={anisotropy_radius:g} kpc)", path)
    if aot_dir is not None and mesh is None:
        from .ensemble import _aot_tag, aot_batch_fn

        tag = _aot_tag("merger", counts=counts, num_points=num_points,
                       batch=int(batch_size), H=H,
                       r_a=anisotropy_radius, gravity=gravity)
        ex = (jnp.zeros((batch_size, H), jnp.float64) + 1.0e15,
              jnp.full((batch_size, H), 5.0, jnp.float64),
              jnp.zeros((batch_size, H, 3), jnp.float64),
              jnp.zeros((batch_size, H, 3), jnp.float64),
              jnp.asarray(r_max_arr),
              jax.random.key(0))
        batch_fn = aot_batch_fn(batch_fn, aot_dir, tag, ex,
                                prime=prime_aot)

    def _dispatch(b0):
        sl = slice(b0, b0 + batch_size)
        Mb, cb = M200[sl], conc[sl]
        ctr_b, vel_b = centers[sl], velocities[sl]
        k_b = jax.random.fold_in(key, b0)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if Mb.shape[0] % mesh.shape["ens"] == 0:
                sh = NamedSharding(mesh, PartitionSpec("ens"))
                Mb, cb, ctr_b, vel_b = (jax.device_put(a, sh) for a in
                                        (Mb, cb, ctr_b, vel_b))
            with mesh:
                return Mb, cb, batch_fn(Mb, cb, ctr_b, vel_b, r_max_arr,
                                        k_b)
        return Mb, cb, batch_fn(Mb, cb, ctr_b, vel_b, r_max_arr, k_b)

    def _write(f, b0, Mb, cb, out):
        out = jax.tree_util.tree_map(np.asarray, out)  # blocks this batch
        Mb, cb = np.asarray(Mb), np.asarray(cb)
        ctr = np.asarray(centers[b0:b0 + Mb.shape[0]])
        vel = np.asarray(velocities[b0:b0 + Mb.shape[0]])
        raw = RawWriter(f)
        for i in range(Mb.shape[0]):
            g = f.create_group(f"scene_{b0 + i:06d}")
            g.attrs["M200"] = Mb[i]
            g.attrs["conc"] = cb[i]
            g.attrs["center"] = ctr[i]
            g.attrs["bulk_velocity"] = vel[i]
            for sp in ("gas", "dm", "star"):
                if f"mass_{sp}" in out:
                    g.attrs[f"particle_mass_{sp}"] = out[f"mass_{sp}"][i]
            for name, arr in out.items():
                if not name.startswith("mass_"):
                    raw.add(g, name, arr[i])
        raw.flush()

    expected = [k for sp in ("gas", "dm", "star") if sum(counts[sp])
                for k in ([f"{sp}_position", f"{sp}_velocity"]
                          + (["gas_thermal_energy", "gas_density"]
                             if sp == "gas" else []))]
    config = {"draws_version": _MERGER_DRAWS_VERSION,
              "product": "merger_scenes",
              "n_clusters": n_sc,  # consumer-facing count (read_catalog
              "n_scenes": n_sc,    # keys on n_clusters); alias for humans
              "n_halos": H, "batch_size": int(batch_size),
              "num_points": int(num_points),
              # 0.0 = ergodic/isotropic (and the pre-knob file default)
              "r_a": (0.0 if anisotropy_radius is None
                      else float(anisotropy_radius)),
              # partitioned programs round ~1 ulp differently — resume
              # must re-run under the same ens layout (see ensemble)
              "mesh_ens": 0 if mesh is None else int(mesh.shape["ens"]),
              "gravity": str(gravity),
              "r_max": np.asarray(r_max_arr, np.float64),
              "params_sha": _params_sha(M200, conc, centers, velocities),
              "shard_rank": int((_extra_attrs or {}).get("shard_rank", 0)),
              "shard_count": int((_extra_attrs or {}).get("shard_count",
                                                          1)),
              "key_data": np.asarray(jax.random.key_data(key)).ravel()}
    for sp in ("gas", "dm", "star"):
        config[f"n_{sp}_per_halo"] = np.asarray(counts[sp], np.int64)

    _stream_batched_catalog(path, resuming, config, _extra_attrs,
                            expected, "scene", n_sc, batch_size,
                            _only_batches, _dispatch, _write)
    return str(path)


def merger_datagen_multihost(params, filename, counts, batch_size=64,
                             num_points=512, r_max=5000.0, key=None,
                             overwrite=False, resume=False, mesh=None,
                             anisotropy_radius=None, gravity="newtonian",
                             prorate=True,
                             aot_dir=None, prime_aot=False,
                             rank=None, nproc=None):
    """Multi-process :func:`merger_datagen`: process ``rank`` of
    ``nproc`` computes batches ``rank, rank+nproc, ...`` into
    ``<stem>.<rank>of<nproc><suffix>`` — same coordinator-free,
    bit-identical sharding as
    :func:`~.ensemble.ensemble_datagen_multihost` (keys fold on the
    global batch offset).  Returns this process's shard filename."""
    import pathlib

    if rank is None:
        rank = jax.process_index()
    if nproc is None:
        nproc = jax.process_count()
    if not 0 <= rank < nproc:
        raise ValueError(f"rank {rank} outside [0, {nproc})")
    path = pathlib.Path(filename)
    shard = path.with_name(f"{path.stem}.{rank}of{nproc}{path.suffix}")
    n_sc = int(jnp.asarray(params["M200"]).shape[0])
    mine = [b0 for i, b0 in enumerate(range(0, n_sc, batch_size))
            if i % nproc == rank]
    return merger_datagen(
        params, str(shard), counts, batch_size=batch_size,
        num_points=num_points, r_max=r_max, key=key, overwrite=overwrite,
        resume=resume, mesh=mesh, anisotropy_radius=anisotropy_radius,
        gravity=gravity,
        prorate=prorate, aot_dir=aot_dir, prime_aot=prime_aot,
        _only_batches=mine,
        _extra_attrs={"shard_rank": rank, "shard_count": nproc})


def read_merger_catalog(filename, indices=None, fields=None):
    """Iterate ``(index, scene_dict)`` over a :func:`merger_datagen`
    catalog — the merger analogue of :func:`~.ensemble.read_catalog`
    (same raw-pread path, shard-set support, and ``fields=`` subsetting;
    scene attrs — per-halo ``M200``/``conc``/masses, ``center``,
    ``bulk_velocity`` — are always included)."""
    import contextlib

    filenames = _catalog_filenames(filename)
    with contextlib.ExitStack() as stack:
        files, readers, n_sc, where = _open_catalog(stack, filenames,
                                                    prefix="scene")
        if indices is None:
            indices = range(n_sc)
        if fields is not None:
            fields = list(fields)
        for i in indices:
            yield int(i), _read_cluster(files, readers, where, int(i),
                                        fields, filenames, prefix="scene")


from .qa import QA_TOLERANCES as _QA


def verify_merger_catalog(filename, indices=None,
                          speed_tol=_QA["speed_tol"],
                          energy_rtol=_QA["merger"]["energy_rtol"],
                          mass_rtol=_QA["merger"]["mass_rtol"],
                          radius_tol=_QA["merger"]["radius_tol"],
                          zero_row_tol=_QA["zero_row_tol"], strict=True):
    """Physics QA gate for a :func:`merger_datagen` catalog — the merger
    analogue of :func:`~.ensemble.verify_catalog` (which dispatches here
    on the ``product = "merger_scenes"`` attr, so the CLI ``verify``
    subcommand covers both products).  Default tolerances and their
    rationale live in :mod:`~.qa` — shared ``speed_tol``/``zero_row_tol``
    with the cluster gate (one draw scheme), merger-specific method
    floors for the energy/radius/mass recomputes.

    Per scene, every halo's equilibrium model is REBUILT from its
    recorded ``(M200, conc)`` and the stored draws are checked against
    it, segment by segment (the static per-halo counts in the file attrs
    attribute every particle to its halo):

    * all values finite; no zero-radius rows or all-zero velocity
      blocks (unwritten file extents);
    * each halo's particles lie within its ``r_max`` of ITS center
      (``radius_tol``);
    * collisionless peculiar speeds (scene velocity minus the halo's
      bulk velocity) stay below the halo's local escape speed
      (``speed_tol``) — the merger draw caps per halo BEFORE adding
      bulk motion;
    * gas thermal energy, density, and velocity reproduce the
      density-weighted mixing over all halos (reference
      particles.py:587-639) recomputed independently from the rebuilt
      radial fields: ``u = sum_h rho_h e_h / sum_h rho_h`` etc.
      (``energy_rtol``);
    * per-halo per-species particle masses reproduce the species'
      grid mass at ``r_max`` (``mass_rtol``).
    """
    import h5py

    from .ensemble import build_one_cluster

    filenames = _catalog_filenames(filename)
    with h5py.File(filenames[0], "r") as f:
        if f.attrs.get("product") != "merger_scenes":
            raise ValueError(f"{filenames[0]} is not a merger-scene "
                             "catalog; use verify_catalog")
        num_points = int(f.attrs["num_points"])
        n_sc = int(f.attrs["n_clusters"])
        H = int(f.attrs["n_halos"])
        r_a = float(f.attrs.get("r_a", 0.0))  # 0 = ergodic/isotropic
        gravity = str(f.attrs.get("gravity", "newtonian"))
        r_max = np.asarray(f.attrs["r_max"], np.float64)
        n_per_halo = {sp: tuple(int(x) for x in
                                f.attrs[f"n_{sp}_per_halo"])
                      for sp in ("gas", "dm", "star")}
    if indices is None:
        indices = range(n_sc)
    indices = list(indices)

    report = {"n_scenes_checked": 0, "n_particles_checked": 0,
              "max_speed_frac": 0.0, "max_energy_rel_err": 0.0,
              "max_density_rel_err": 0.0, "max_velocity_err": 0.0,
              "max_radius_frac": 0.0, "max_mass_rel_err": 0.0,
              "violations": []}
    species_mass = {"dm": "dark_matter_mass", "star": "stellar_mass",
                    "gas": "gas_mass"}

    def _check(cond, msg):
        if not cond:
            report["violations"].append(msg)

    # one jitted H-vmapped rebuild reused across scenes (traces once),
    # under the catalog's recorded gravity law (the v_esc/energy checks
    # are meaningless against the wrong law — a mislabeled catalog
    # fails loudly: MOND draws exceed the Newtonian v_esc near r_max)
    build_fn = jax.jit(jax.vmap(lambda m, c: build_one_cluster(
        m, c, num_points=num_points, with_df=False, gravity=gravity)))

    def _loglerp(r, rr, vals):
        # the device mix lerps values with LOG-space weights on the
        # log-spaced grid, clamped at both ends (_log_grid_locate +
        # clamp-to-last-point); np.interp on log r reproduces it
        return np.interp(np.log(np.maximum(r, rr[0])), np.log(rr), vals)

    for i, sc in read_merger_catalog(filenames, indices=indices):
        f = build_fn(jnp.asarray(sc["M200"], jnp.float64),
                     jnp.asarray(sc["conc"], jnp.float64))
        rr = np.asarray(f["radius"], np.float64)          # (H, n)
        psi = -np.asarray(f["gravitational_potential"], np.float64)
        rho = np.asarray(f["density"], np.float64)
        e_grid = 1.5 * np.asarray(f["pressure"], np.float64) / rho
        centers = np.asarray(sc["center"], np.float64)
        bulk = np.asarray(sc["bulk_velocity"], np.float64)

        for sp in ("dm", "star"):
            if f"{sp}_position" not in sc:
                continue
            pos = np.asarray(sc[f"{sp}_position"], np.float64)
            vel = np.asarray(sc[f"{sp}_velocity"], np.float64)
            _check(np.isfinite(pos).all() and np.isfinite(vel).all(),
                   f"scene {i} {sp}: non-finite values")
            o = 0
            for h, n_h in enumerate(n_per_halo[sp]):
                if n_h == 0:
                    continue
                seg = slice(o, o + n_h)
                o += n_h
                r = np.sqrt(((pos[seg] - centers[h]) ** 2).sum(axis=1))
                zfrac = float((r == 0.0).mean())
                _check(zfrac <= zero_row_tol,
                       f"scene {i} {sp} halo {h}: {zfrac:.2%} "
                       "zero-radius rows (unwritten file extents?)")
                # raw stored velocities: an unwritten extent is zero-filled,
                # while healthy merger draws always carry nonzero bulk
                # motion (matches verify_catalog's check, ensemble.py)
                _check(np.count_nonzero(vel[seg]) > 0,
                       f"scene {i} {sp} halo {h}: all-zero stored "
                       "velocities (unwritten file extents?)")
                rfrac = float(r.max() / r_max[h])
                report["max_radius_frac"] = max(
                    report["max_radius_frac"], rfrac)
                _check(rfrac <= 1.0 + radius_tol,
                       f"scene {i} {sp} halo {h}: radius {rfrac:.6f} "
                       "of r_max")
                v = np.sqrt(((vel[seg] - bulk[h]) ** 2).sum(axis=1))
                v_esc = np.sqrt(2.0 * np.interp(r, rr[h], psi[h]))
                frac = float((v / v_esc).max())
                report["max_speed_frac"] = max(report["max_speed_frac"],
                                               frac)
                _check(frac <= 1.0 + speed_tol,
                       f"scene {i} {sp} halo {h}: peculiar speed "
                       f"{frac:.6f} of local v_esc")
                if r_a > 0.0:
                    # OM anisotropy: drawn beta of the halo's PECULIAR
                    # velocities in a shell around r_a must track
                    # beta_OM = r^2/(r^2 + r_a^2) — same statistical
                    # gate as the single-cluster verifier (ensemble.py)
                    nh = (pos[seg] - centers[h]) / np.maximum(
                        r, 1e-30)[:, None]
                    v_r = ((vel[seg] - bulk[h]) * nh).sum(axis=1)
                    shell = ((r >= 1.2 * r_a)
                             & (r <= min(2.0 * r_a, float(r_max[h]))))
                    if shell.sum() >= 1000:
                        v_t2 = v[shell] ** 2 - v_r[shell] ** 2
                        beta = 1.0 - v_t2.mean() / (
                            2.0 * (v_r[shell] ** 2).mean())
                        rmid = float(r[shell].mean())
                        b_om = rmid ** 2 / (rmid ** 2 + r_a ** 2)
                        _check(abs(beta - b_om) < 0.15,
                               f"scene {i} {sp} halo {h}: anisotropy "
                               f"beta {beta:.3f} vs OM {b_om:.3f} at "
                               f"r~{rmid:.0f} (isotropic draws in an "
                               "OM catalog?)")
                m_tot = float(np.interp(r_max[h], rr[h],
                                        np.asarray(f[species_mass[sp]],
                                                   np.float64)[h]))
                pmass = float(np.asarray(sc[f"particle_mass_{sp}"])[h])
                merr = abs(pmass * n_h - m_tot) / m_tot
                report["max_mass_rel_err"] = max(
                    report["max_mass_rel_err"], merr)
                _check(merr <= mass_rtol,
                       f"scene {i} {sp} halo {h}: mass budget off by "
                       f"{merr:.2e}")
                report["n_particles_checked"] += n_h

        if "gas_position" in sc:
            pos = np.asarray(sc["gas_position"], np.float64)
            u = np.asarray(sc["gas_thermal_energy"], np.float64)
            dens = np.asarray(sc["gas_density"], np.float64)
            gvel = np.asarray(sc["gas_velocity"], np.float64)
            _check(np.isfinite(pos).all() and np.isfinite(u).all(),
                   f"scene {i} gas: non-finite values")
            _check((u > 0).all() and (dens > 0).all(),
                   f"scene {i} gas: non-positive energy or density")
            # independent recomputation of the density-weighted mix
            d_exp = 0.0
            de_exp = 0.0
            dv_exp = 0.0
            for h in range(H):
                r_h = np.sqrt(((pos - centers[h]) ** 2).sum(axis=1))
                d_h = _loglerp(r_h, rr[h], rho[h])
                d_exp = d_exp + d_h
                # the device mix sums the interpolated PRODUCT rho*e per
                # halo (pipeline._mix_gas packs [rho, rho*e] rows), so
                # the recompute interpolates rho*e, not e
                de_exp = de_exp + _loglerp(r_h, rr[h],
                                           rho[h] * e_grid[h])
                dv_exp = dv_exp + d_h[:, None] * bulk[h]
            # radius bound per owning segment
            o = 0
            for h, n_h in enumerate(n_per_halo["gas"]):
                if n_h == 0:
                    continue
                seg = slice(o, o + n_h)
                o += n_h
                r = np.sqrt(((pos[seg] - centers[h]) ** 2).sum(axis=1))
                zfrac = float((r == 0.0).mean())
                _check(zfrac <= zero_row_tol,
                       f"scene {i} gas halo {h}: {zfrac:.2%} "
                       "zero-radius rows (unwritten file extents?)")
                rfrac = float(r.max() / r_max[h])
                report["max_radius_frac"] = max(
                    report["max_radius_frac"], rfrac)
                _check(rfrac <= 1.0 + radius_tol,
                       f"scene {i} gas halo {h}: radius {rfrac:.6f} "
                       "of r_max")
                m_tot = float(np.interp(r_max[h], rr[h],
                                        np.asarray(f["gas_mass"],
                                                   np.float64)[h]))
                pmass = float(np.asarray(sc["particle_mass_gas"])[h])
                merr = abs(pmass * n_h - m_tot) / m_tot
                report["max_mass_rel_err"] = max(
                    report["max_mass_rel_err"], merr)
                _check(merr <= mass_rtol,
                       f"scene {i} gas halo {h}: mass budget off by "
                       f"{merr:.2e}")
            u_exp = de_exp / d_exp
            rel = float((np.abs(u - u_exp) / u_exp).max())
            report["max_energy_rel_err"] = max(
                report["max_energy_rel_err"], rel)
            _check(rel <= energy_rtol,
                   f"scene {i} gas: mixed thermal energy off by "
                   f"{rel:.3e}")
            drel = float((np.abs(dens - d_exp) / d_exp).max())
            report["max_density_rel_err"] = max(
                report["max_density_rel_err"], drel)
            _check(drel <= energy_rtol,
                   f"scene {i} gas: mixed density off by {drel:.3e}")
            # mixed velocity: absolute error vs the bulk-speed scale
            v_scale = max(float(np.abs(bulk).max()), 1e-3)
            verr = float(np.abs(gvel - dv_exp / d_exp[:, None]).max()
                         / v_scale)
            report["max_velocity_err"] = max(report["max_velocity_err"],
                                             verr)
            _check(verr <= energy_rtol,
                   f"scene {i} gas: mixed velocity off by {verr:.3e} "
                   "of the bulk-speed scale")
            report["n_particles_checked"] += len(u)
        report["n_scenes_checked"] += 1

    if strict and report["violations"]:
        raise ValueError("merger catalog failed physics QA:\n  "
                         + "\n  ".join(report["violations"][:20]))
    return report


def scene_to_particles(filename, index):
    """Load one merger scene as a
    :class:`~cluster_generator_tpu.particles.ClusterParticles` — the
    bridge from merger catalogs to the exporter stack
    (:func:`~.ensemble.catalog_to_particles` dispatches here on the
    ``product`` attr).  Per-halo particle masses expand over the static
    per-halo segments; gas keeps its mixed velocity, thermal energy,
    and density.  Scene positions are in the scene frame (the requested
    scene center, default origin) — for a Gadget box add
    ``p.add_offsets([box/2]*3, [0]*3)`` as with cluster catalogs."""
    import h5py

    from ..particles import ClusterParticles

    filenames = _catalog_filenames(filename)
    with h5py.File(filenames[0], "r") as f:
        n_per_halo = {sp: tuple(int(x) for x in
                                f.attrs[f"n_{sp}_per_halo"])
                      for sp in ("gas", "dm", "star")}
    (_, sc), = read_merger_catalog(filenames, indices=[index])
    fields = {}
    for sp in ("gas", "dm", "star"):
        pos = sc.get(f"{sp}_position")
        if pos is None:
            continue
        fields[sp, "particle_position"] = pos
        fields[sp, "particle_velocity"] = sc[f"{sp}_velocity"]
        pm = np.asarray(sc[f"particle_mass_{sp}"], np.float32)
        fields[sp, "particle_mass"] = np.repeat(pm, n_per_halo[sp])
        if sp == "gas":
            fields[sp, "thermal_energy"] = sc["gas_thermal_energy"]
            fields[sp, "density"] = sc["gas_density"]
    return ClusterParticles.from_fields(fields)
