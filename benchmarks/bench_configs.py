#!/usr/bin/env python
"""BASELINE.md benchmark configs 1-3, 5 and the 512^3 field build, each
printing ONE JSON line like bench.py (which owns config 4, the headline).

    python benchmarks/bench_configs.py cfg1|cfg2|cfg3|cfg5|field|all

vs_baseline denominators are the MEASURED reference wall-times on this
machine's CPU (benchmarks/reference_baselines.json, produced by running
the upstream package via tests/refshim) — not guesses:
  cfg1: reference from_dens_and_tden at 4096 points
  cfg2: + Eddington DF + 1e6 velocity draws (reference total)
  cfg3: full 3-component + B-field + HSE/virial checks (reference total)
  cfg5: 1024 x cfg-3-equivalent serial extrapolation (the reference has
        no batch axis; documented as an extrapolation)
  field: reference RandomMagneticField at 512^3 (numpy FFT + div-clean)

Timing protocol: compile + first run, then median of 3 warm runs; honest
completion via a small scalar D2H per run (block_until_ready is not
reliable under the axon tunnel).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_SMOKE = os.environ.get("BENCH_SMOKE") == "1"


def _baselines():
    path = os.path.join(ROOT, "benchmarks", "reference_baselines.json")
    with open(path) as f:
        return json.load(f)


def _force(*xs):
    import jax.numpy as jnp

    return float(sum(jnp.sum(jnp.ravel(x)[-2:]) for x in xs))


def _timed(metric, baseline_s, run, n_warm=3, extra=None):
    t0 = time.time()
    run(0)
    compile_s = time.time() - t0
    print(f"# {metric}: compile+first-run {compile_s:.1f}s", file=sys.stderr)
    times = []
    for i in range(n_warm):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
        print(f"# {metric}: warm {times[-1]:.3f}s", file=sys.stderr)
    value = sorted(times)[len(times) // 2]
    out = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / value, 3) if baseline_s else None,
    }
    for k, v in (extra or {}).items():
        out[k] = v(value) if callable(v) else v
    print(json.dumps(out))


def bench_cfg1():
    """Gas-only hydrostatic model, 4096-point grid, no particles."""
    import jax

    from cluster_generator_tpu.parallel.ensemble import build_one_cluster

    n = 512 if _SMOKE else 4096
    fn = jax.jit(lambda m, c: build_one_cluster(m, c, num_points=n,
                                                with_df=False))
    # the denominator must be the 4096-pt reference measurement
    # (measure_reference_extra.py); report no ratio rather than one
    # quietly computed against the ~5x-cheaper 1000-pt build
    b = _baselines().get("cfg1_model_build_4096pt_s")
    _timed("cfg1_gas_model_4096pt_wall_time", b,
           lambda i: _force(fn(1.5e15 * (1 + 1e-6 * i), 4.0)["pressure"]))


def bench_cfg2():
    """Model + virialized DM halo: DF + 1e6 velocity samples, f(E)>0."""
    import jax
    import jax.numpy as jnp

    from cluster_generator_tpu.parallel.ensemble import build_one_cluster
    from cluster_generator_tpu.virial import (
        speed_inverse_cdf_table,
        speed_table_defaults,
    )

    n_part = 10_000 if _SMOKE else 1_000_000
    kw = speed_table_defaults()

    import numpy as np

    # the class API's 256-row energy subgrid (virial._speed_table)
    n_pts = 1000
    row_idx = np.unique(np.round(
        np.linspace(0, n_pts - 1, 256)).astype(int))

    from cluster_generator_tpu.core.interp import adjacent_pairs
    from cluster_generator_tpu.virial import (
        build_joint_speed_pairs,
        sample_speeds_joint,
    )

    RQ = 4096

    @jax.jit
    def run(m, key):
        f = build_one_cluster(m, 4.0, num_points=n_pts, with_df=True)
        ee = -f["gravitational_potential"][::-1]
        df = f["dm_df"][::-1]
        row_ee = ee[row_idx]
        tab = speed_inverse_cdf_table(ee, df, row_ee=row_ee, **kw)
        rr, mm = f["radius"], f["dark_matter_mass"]
        # the class-API draw design (sampling.generate_collisionless_
        # particles): radius quantile-pair table + computed-index lerp
        # (no per-particle search), joint absolute-speed table + one
        # row-of-2 gather (no psi lookup) — measured 3x on cfg2's old
        # S3/S4/S5 stages (scripts/tpu_r3_cfg2_ablation.py)
        q = jnp.linspace(0.0, 1.0, RQ)
        r_q = jnp.interp(q * mm[-1], mm, rr)
        r_pair = adjacent_pairs(r_q)
        joint = build_joint_speed_pairs(
            rr, -f["gravitational_potential"], row_ee, tab, r_q,
            dtype=tab.dtype)
        # INDEPENDENT streams for radius and speed quantiles (a shared
        # key would correlate the draws; SURVEY.md §7 hard part e)
        k_r, k_v = jax.random.split(key)
        u = jax.random.uniform(k_r, (n_part,))
        x = jnp.clip(u * (RQ - 1), 0.0, RQ - 1 - 1e-9)
        kq = x.astype(jnp.int32)
        wq = x - kq
        rp = r_pair[kq]
        radius = (1.0 - wq) * rp[:, 0] + wq * rp[:, 1]
        v = sample_speeds_joint(joint, tab.shape[1], kq, wq, k_v)
        return radius, v, jnp.min(df)

    def once(i):
        radius, v, fmin = run(1.5e15 * (1 + 1e-6 * i), jax.random.key(i))
        assert float(fmin) >= 0.0, "f(E) < 0"
        return _force(radius, v)

    _timed("cfg2_dm_virialized_1e6_wall_time",
           _baselines().get("cfg2_total_s"), once)


def bench_cfg3():
    """Full gas+DM+stars + tangential B-field + HSE/virial residuals."""
    import jax
    import jax.numpy as jnp

    from cluster_generator_tpu.core.interp import cubic_spline, spline_eval
    from cluster_generator_tpu.pipeline import build_merger_models
    from cluster_generator_tpu.virial import check_virial_density

    n = 256 if _SMOKE else 1000

    @jax.jit
    def run(m):
        f = build_merger_models(jnp.asarray([m]), jnp.asarray([4.0]),
                                num_points=n)
        f1 = jax.tree_util.tree_map(lambda a: a[0], f)
        # tangential B from beta = 100 (model.py:718-740 math)
        B = jnp.sqrt(8.0 * jnp.pi * f1["pressure"] / 100.0)
        ee = -f1["gravitational_potential"][::-1]
        rho_df = check_virial_density(ee, f1["dm_df"][::-1])
        # HSE residual (model.py:667-690 math, jitted inline)
        rr = f1["radius"]
        dPdx = spline_eval(cubic_spline(rr, f1["pressure"]), rr, nu=1)
        rhog = f1["density"] * f1["gravitational_field"]
        hse = (dPdx - rhog) / rhog
        return B, rho_df, hse

    def once(i):
        B, rho_df, hse = run(1.5e15 * (1 + 1e-6 * i))
        # coarse smoke grids (n=256) carry larger spline-derivative noise
        assert float(jnp.max(jnp.abs(hse))) < (5e-3 if _SMOKE else 1e-4)
        return _force(B, rho_df)

    _timed("cfg3_full_cluster_checks_wall_time",
           _baselines().get("cfg3_total_s"), once)


def bench_cfg5():
    """1024-cluster vmapped ensemble (M500-c sampled), HSE + DF."""
    import jax

    from cluster_generator_tpu.parallel import (
        build_ensemble,
        sample_ensemble_params,
    )

    n_cl = 32 if _SMOKE else 1024
    n_pts = 128 if _SMOKE else 512
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)
    b = _baselines().get("cfg3_total_s")
    base = 1024.0 * b if b else None  # serial reference extrapolation

    def once(i):
        out = build_ensemble(M * (1 + 1e-6 * i), c, num_points=n_pts)
        return _force(out["dm_df"])

    _timed("cfg5_ensemble_1024_clusters_wall_time", base, once)


def bench_cfg5b():
    """Ensemble datagen END-TO-END: 1024 clusters -> 1e5 DM phase-space
    draws EACH (1.02e8 particles), in HBM-sized cluster batches.

    Runs the SAME jitted batch program as the production
    ``parallel.ensemble.ensemble_datagen`` API (minus the host HDF5
    writes): per cluster, HSE build + Eddington DF + the 256-row inverse
    speed-CDF table, then n_p positions + velocities through the radius
    quantile-pair table and the joint absolute-speed table.

    Memory envelope (f32): a batch of B clusters x n_p particles holds
    6*4*B*n_p bytes of draws; at B=256, n_p=1e5 that is ~0.65 GB -> 4
    batches cover 1024 clusters inside a 16 GB v5e HBM.  Scaling limit:
    B*n_p <= ~5e8/6 values; beyond that, shard the cluster axis over a
    mesh (parallel/ensemble.py) or stream batches like ensemble_datagen.
    """
    import jax

    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import _datagen_batch_fn

    n_cl = 32 if _SMOKE else 1024
    n_batch = 8 if _SMOKE else 256
    n_part = 2_000 if _SMOKE else 100_000
    n_pts = 128 if _SMOKE else 512
    run_batch = _datagen_batch_fn(n_pts, n_part)

    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    def once(i):
        tot = 0.0
        for b0 in range(0, n_cl, n_batch):
            pos, vel, _ = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                                    c[b0:b0 + n_batch], jax.random.key(i))
            tot += _force(pos, vel)
        return tot

    _timed("cfg5b_ensemble_datagen_1024x1e5_wall_time", None, once,
           extra={"clusters_per_s": lambda v: round(n_cl / v, 1),
                  "particles_total": n_cl * n_part})


def bench_cfg5c():
    """Full-species ensemble datagen: 1024 clusters x 1e5 particles EACH
    (5e4 DM + 4e4 gas + 1e4 star; 1.02e8 total) — the complete
    per-cluster IC product (positions + velocities + thermal energy for
    every species) at ensemble scale, VERDICT r3 item 1.

    Same program as ``ensemble_datagen(..., {"dm": ..., "gas": ...,
    "star": ...})`` minus the host HDF5 writes (which overlap device
    compute in the API).  Per cluster this adds to cfg5b: a second
    Eddington DF (stars), a second speed table, and the gas draws —
    the star table work is count-independent, so the rate is dominated
    by total draws + per-cluster table builds.
    """
    import jax

    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import _datagen_full_batch_fn

    n_cl = 32 if _SMOKE else 1024
    n_batch = 8 if _SMOKE else 256
    n_dm, n_gas, n_star = ((1_000, 800, 200) if _SMOKE
                           else (50_000, 40_000, 10_000))
    n_pts = 128 if _SMOKE else 512
    run_batch = _datagen_full_batch_fn(n_pts, n_dm, n_gas, n_star)

    M, c = sample_ensemble_params(jax.random.key(7), n_cl)

    def once(i):
        tot = 0.0
        for b0 in range(0, n_cl, n_batch):
            out = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                            c[b0:b0 + n_batch], jax.random.key(i))
            tot += _force(out["dm"][0], out["dm"][1], out["gas"][0],
                          out["gas"][1], out["star"][0], out["star"][1])
        return tot

    _timed("cfg5c_ensemble_full_species_1024x1e5_wall_time", None, once,
           extra={"clusters_per_s": lambda v: round(n_cl / v, 1),
                  "particles_total": n_cl * (n_dm + n_gas + n_star)})


def bench_cfg6():
    """Merger-scene ensemble datagen: 256 binary-merger ICs x 1e5
    particles EACH (5e4 DM + 4e4 gas + 1e4 star per scene, split across
    the two halos; 2.56e7 total) — the reference's headline product
    (``ClusterICs.setup_particle_ics`` on a binary scene, ics.py:323-375)
    at ensemble scale.

    Same program as ``parallel.merger_datagen`` minus the host HDF5
    writes: per scene, TWO equilibrium models + per-species Eddington
    DFs + tables, every species' draws, density-weighted gas mixing,
    and the zero-momentum scene placement, vmapped over the batch.
    Per-scene work is ~2x a cfg5c cluster (two halos) plus the mixing.
    """
    import jax

    from cluster_generator_tpu.parallel.mergers import (
        _merger_batch_fn,
        binary_scene_geometry,
        sample_merger_scene_params,
    )

    n_sc = 8 if _SMOKE else 256
    n_batch = 4 if _SMOKE else 64
    n_dm, n_gas, n_star = ((1_000, 800, 200) if _SMOKE
                           else (50_000, 40_000, 10_000))
    n_pts = 128 if _SMOKE else 512

    def _split(n):
        return (n // 2, n - n // 2)

    run_batch = _merger_batch_fn(n_pts, _split(n_gas), _split(n_dm),
                                 _split(n_star))
    p = sample_merger_scene_params(jax.random.key(7), n_sc)
    centers, velocities = binary_scene_geometry(p["M200"], p["d"], p["b"],
                                                p["v_rel"])
    import jax.numpy as jnp

    r_max = jnp.asarray([5000.0, 5000.0], jnp.float64)

    def once(i):
        tot = 0.0
        for b0 in range(0, n_sc, n_batch):
            sl = slice(b0, b0 + n_batch)
            out = run_batch(p["M200"][sl] * (1 + 1e-6 * i), p["conc"][sl],
                            centers[sl], velocities[sl], r_max,
                            jax.random.key(i))
            tot += _force(out["dm_position"], out["dm_velocity"],
                          out["gas_position"], out["gas_thermal_energy"],
                          out["star_position"])
        return tot

    _timed("cfg6_merger_datagen_256x1e5_wall_time", None, once,
           extra={"scenes_per_s": lambda v: round(n_sc / v, 1),
                  "particles_total": n_sc * (n_dm + n_gas + n_star)})


def bench_field():
    """512^3 divergence-free Gaussian random magnetic field.

    float32 spectra (c64 FFTs): TPU has no c128 FFT, and a GRF's content
    is statistical — the f64 path is covered by CPU correctness tests.
    The reference baseline computes in numpy f64 (its only option).
    """
    import jax.numpy as jnp

    from cluster_generator_tpu.fields.grf import RandomMagneticField

    dim = 128 if _SMOKE else 512

    def once(i):
        f = RandomMagneticField([-1000.0] * 3, [1000.0] * 3,
                                (dim, dim, dim), 50.0, 500.0, 1.0e-6,
                                padding=0.0, prng=42 + i,
                                dtype=jnp.float32)
        return _force(f.gx, f.gy, f.gz)

    _timed("field_512_grf_wall_time", _baselines().get("field_512_s"), once)


ALL = {"cfg1": bench_cfg1, "cfg2": bench_cfg2, "cfg3": bench_cfg3,
       "cfg5": bench_cfg5, "cfg5b": bench_cfg5b, "cfg5c": bench_cfg5c,
       "cfg6": bench_cfg6, "field": bench_field}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(ALL) if which == "all" else [which]
    for name in names:
        ALL[name]()


if __name__ == "__main__":
    main()
