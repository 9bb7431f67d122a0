#!/usr/bin/env python
"""TPU round-4 batch 2.

1. cfg5c with the coarse star tables (star_n_rows=64, star_rq=512,
   star_n_s=256, star_n_q=256 — the new defaults): the r4 attribution run
   (r4_cfg5c_attr.log) pinned +3.3 s of cfg5c's +3.65 s full-species
   overhead on the star table builds (full-resolution CDF inversion +
   joint table per cluster for a 1e4-draw species).
2. AOT first-IC latency (VERDICT r3 item 5): `bench.py --prime-aot` then
   a FRESH process running `bench.py` — the first-run figure with the
   deserialized executable is the number a user pays for their first IC.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def _force(out):
    tot = 0.0
    for sp, arrs in out.items():
        tot += float(sum(jnp.sum(jnp.ravel(a)[-2:]) for a in arrs[:2]))
    return tot


def main():
    t0 = time.time()
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.float32(1.0))))
    print(f"# backend warm-up: {time.time() - t0:.1f}s", flush=True)

    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import _datagen_full_batch_fn

    n_cl, n_batch, n_pts = 1024, 256, 512
    nd, ng, ns = 50_000, 40_000, 10_000
    M, c = sample_ensemble_params(jax.random.key(7), n_cl)
    run_batch = _datagen_full_batch_fn(n_pts, nd, ng, ns)

    def once(i):
        tot = 0.0
        for b0 in range(0, n_cl, n_batch):
            out = run_batch(M[b0:b0 + n_batch] * (1 + 1e-6 * i),
                            c[b0:b0 + n_batch], jax.random.key(i))
            tot += _force(out)
        return tot

    t0 = time.time()
    once(0)
    print(f"# cfg5c[coarse-star]: compile+first-run {time.time() - t0:.1f}s",
          flush=True)
    times = []
    for i in range(3):
        t0 = time.time()
        once(i + 1)
        times.append(time.time() - t0)
        print(f"# cfg5c[coarse-star]: warm {times[-1]:.3f}s", flush=True)
    print(f"RESULT cfg5c_coarse_star median {sorted(times)[1]:.3f}s",
          flush=True)

    # ---- AOT prime + fresh-process first-IC latency ----
    env = dict(os.environ)
    for tag, args in [("prime", ["--prime-aot"]), ("fresh", [])]:
        t0 = time.time()
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")]
                           + args, capture_output=True, text=True, env=env,
                           cwd=ROOT)
        print(f"=== bench.py {tag} (total {time.time() - t0:.1f}s, "
              f"rc={r.returncode}) ===", flush=True)
        print(r.stderr, flush=True)
        print(r.stdout, flush=True)

    print("BATCH2 DONE", flush=True)


if __name__ == "__main__":
    main()
