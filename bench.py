#!/usr/bin/env python
"""Headline benchmark: 1e7-particle three-component binary-merger IC.

BASELINE.md target: < 5 s wall-time on one TPU chip for the full pipeline —
two HSE equilibrium models (4096.. 1000-pt grids), Eddington inversions,
speed tables, and 10^7 particle draws (gas+DM+stars) with merger gas mixing,
materialized as device arrays.

Prints ONE JSON line:
  {"metric": ..., "value": <warm seconds>, "unit": "s",
   "vs_baseline": <baseline_s / value>}  (>1 means faster than target)
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_S = 5.0
NUM_PARTICLES = {"gas": 5_000_000, "dm": 4_000_000, "star": 1_000_000}

# BENCH_SMOKE=1 shrinks the workload 100x (CI/format guard; the official
# metric is always the full 1e7-particle run)
_SMOKE = os.environ.get("BENCH_SMOKE") == "1"


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Backend warm-up FIRST — before any jnp array creation — so a dead
    # backend (e.g. the round-4 UNAVAILABLE outage, benchmarks/
    # measurements_r4/r4_batch7.log) lands in the graceful path below
    # and the driver still gets one parseable JSON line. This is also
    # the measured per-process axon warm-up split (25-404 s,
    # environmental — scripts/diag_compile_r3.py).  The outage has a
    # second mode — init HANGS instead of erroring, stuck inside a C
    # call that neither returns nor raises (so signals/alarms never run)
    # — a watchdog THREAD emits the same JSON error line and exits.
    import threading

    warmed = threading.Event()

    def _watchdog():
        limit = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900"))
        if not warmed.wait(limit):
            print(json.dumps({
                "metric": "binary_merger_ic_1e7_particles_wall_time",
                "value": None, "unit": "s", "vs_baseline": None,
                "error": f"TPU backend init hang (> {limit:.0f}s; "
                         "max healthy warm-up measured 404s)",
                "last_measured_warm_s": 0.141,
                "last_measured_ref": "benchmarks/measurements_r4/",
            }), flush=True)
            # nonzero so wrappers keying on the exit status (e.g. the
            # round-final supervisor's stage markers) see the failure;
            # the driver parses the JSON line either way
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    t0 = time.time()
    try:
        float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
        warmed.set()
    except Exception as e:
        warmed.set()
        # BENCH_RETRY_S>0 polls a subprocess probe (backend-init failures
        # are cached per process) and re-execs fresh if it comes back.
        deadline = time.time() + float(os.environ.get("BENCH_RETRY_S", "0"))
        while time.time() < deadline:
            import subprocess

            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "float(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))"],
                capture_output=True, timeout=1200)
            if probe.returncode == 0:
                os.execv(sys.executable, [sys.executable] + sys.argv)
            time.sleep(60)
        print(json.dumps({
            "metric": "binary_merger_ic_1e7_particles_wall_time",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": f"TPU backend unavailable: {type(e).__name__}",
            "last_measured_warm_s": 0.141,
            "last_measured_ref": "benchmarks/measurements_r4/",
        }))
        sys.exit(2)  # see the watchdog's exit-status comment
    warmup_s = time.time() - t0

    from cluster_generator_tpu.core.aot import artifact_path, load_compiled
    from cluster_generator_tpu.pipeline import merger_ic_fused

    M200 = jnp.asarray([1.5e15, 1.0e15])
    conc = jnp.asarray([4.0, 5.0])
    centers = jnp.asarray([[-1500.0, 0.0, 0.0], [1500.0, 0.0, 0.0]])
    vels = jnp.asarray([[0.3, 0.0, 0.0], [-0.45, 0.0, 0.0]])
    rmax = jnp.asarray([5000.0, 5000.0])
    # static per-halo counts (mass-prorated for this configuration)
    ng, nd, ns = ((3_000_000, 2_000_000), (2_400_000, 1_600_000),
                  (600_000, 400_000))
    if _SMOKE:
        div = 100
        ng, nd, ns = (tuple(n // div for n in t) for t in (ng, nd, ns))

    jitted = jax.jit(lambda key: merger_ic_fused(
        M200, conc, centers, vels, rmax, key, ng, nd, ns))

    print(f"# backend warm-up (trivial jit): {warmup_s:.1f}s",
          file=sys.stderr)

    # AOT-serialized executable (VERDICT r3 item 5): a primed artifact
    # skips tracing + lowering + compile-cache lookup entirely.  Prime
    # with `python bench.py --prime-aot` at HEAD on the target backend.
    # Round-5 keying: the artifact carries the lowered-program
    # fingerprint, so commits that don't change this program keep it
    # alive (load verifies by re-lowering once per fresh source digest,
    # then the sidecar makes later loads zero-trace) — the r4 scheme
    # lost the artifact to ANY commit (VERDICT r4 weak #3).
    aot_file = artifact_path("/root/repo/.aot",
                             f"merger_ic_{'smoke' if _SMOKE else 'full'}")
    call = None
    if "--prime-aot" in sys.argv:
        from cluster_generator_tpu.core.aot import prune_stale, save_compiled

        t0 = time.time()
        call = save_compiled(jitted, (jax.random.key(0),), aot_file)
        print(f"# AOT prime (lower+compile+serialize): "
              f"{time.time() - t0:.1f}s -> {aot_file}", file=sys.stderr)
        for p in prune_stale("/root/repo/.aot",
                             f"merger_ic_{'smoke' if _SMOKE else 'full'}"):
            print(f"# pruned stale artifact: {p}", file=sys.stderr)
    else:
        t0 = time.time()
        call = load_compiled(aot_file, jitted, (jax.random.key(0),))
        if call is not None:
            print(f"# AOT executable loaded in {time.time() - t0:.2f}s "
                  f"({aot_file})", file=sys.stderr)
    aot = call is not None
    if not aot:
        call = jitted

    def run(key):
        # the whole IC (models + DFs + tables + 1e7 draws) is ONE program
        p, _ = call(key)
        # force completion with a small checksum transfer
        return float(jnp.sum(p["dm", "particle_velocity"][::4096])
                     + jnp.sum(p["gas", "thermal_energy"][::4096]))

    t0 = time.time()
    checksum = run(jax.random.key(0))  # (compile +) first run
    compile_s = time.time() - t0
    print(f"# {'first-run (AOT)' if aot else 'compile+first-run'}: "
          f"{compile_s:.1f}s checksum={checksum:.6g}", file=sys.stderr)

    times = []
    for trial in range(3):
        t0 = time.time()
        run(jax.random.key(trial + 1))
        times.append(time.time() - t0)
        print(f"# warm trial {trial}: {times[-1]:.3f}s", file=sys.stderr)

    value = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "binary_merger_ic_1e7_particles_wall_time",
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 3),
        "aot": aot,
        "first_run_s": round(compile_s, 2),
    }))


if __name__ == "__main__":
    main()
