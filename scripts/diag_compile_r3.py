"""Round-3 diagnosis of the compile+first-run split (VERDICT #2).

Measures, in ONE TPU process:
  A. process warm-up: first trivial jit dispatch (remote-compiler spin-up)
  B. marginal trivial compile: a second, different trivial jit
  C. bench-path compile+first-run with the persistent cache enabled and
     jax_explain_cache_misses on (stderr shows hit/miss per program)
  D. warm run
Run twice back-to-back (fresh processes) to see cross-process cache reuse.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_explain_cache_misses", True)

out = {}

t0 = time.time()
x = jax.jit(lambda x: x + 1)(jnp.float32(1.0))
float(x)
out["A_warmup_first_trivial_jit_s"] = time.time() - t0

t0 = time.time()
y = jax.jit(lambda x: x * 3 + 2)(jnp.float32(2.0))
float(y)
out["B_marginal_trivial_jit_s"] = time.time() - t0

from cluster_generator_tpu.pipeline import merger_ic_fused

M200 = jnp.asarray([1.5e15, 1.0e15]); conc = jnp.asarray([4.0, 5.0])
centers = jnp.asarray([[-1500.0, 0.0, 0.0], [1500.0, 0.0, 0.0]])
vels = jnp.asarray([[0.3, 0.0, 0.0], [-0.45, 0.0, 0.0]])
rmax = jnp.asarray([5000.0, 5000.0])
ng, nd, ns = ((3_000_000, 2_000_000), (2_400_000, 1_600_000),
              (600_000, 400_000))

def run(key):
    p, _ = merger_ic_fused(M200, conc, centers, vels, rmax, key, ng, nd, ns)
    return float(jnp.sum(p["dm", "particle_velocity"][::4096])
                 + jnp.sum(p["gas", "thermal_energy"][::4096]))

t0 = time.time()
run(jax.random.key(0))
out["C_bench_compile_first_run_s"] = time.time() - t0

t0 = time.time()
run(jax.random.key(1))
out["D_warm_s"] = time.time() - t0

print("DIAG " + json.dumps({k: round(v, 2) for k, v in out.items()}))
