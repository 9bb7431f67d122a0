"""cfg5c datagen-product AOT: prime the batch-program artifact, then
measure a FRESH process's first-batch latency loading it.

VERDICT r4 item 2's "Done" asks for a measured fresh-process
first-batch number for the cfg5c product (the 1024 x 1e5 full-species
catalog program paid 148-231 s cold compile per fresh process,
r4_final_seq.log).  Usage:

    python scripts/tpu_r5_cfg5c_aot.py prime    # compile + serialize
    python scripts/tpu_r5_cfg5c_aot.py measure  # fresh process: load +
                                                # one 256-cluster batch

Run the two as SEPARATE processes (the measure must not inherit the
prime's live executables).  Config matches benchmarks/bench_configs.py
bench_cfg5c: counts {dm 5e4, gas 4e4, star 1e4}, 512-pt grids,
batch 256.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_start = time.time()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

AOT_DIR = "/root/repo/.aot"
COUNTS = {"dm": 50_000, "gas": 40_000, "star": 10_000}
BATCH = 256
N_PTS = 512


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "measure"
    # warm up the backend outside the timed region
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    print(f"# backend warm-up: {time.time() - t_start:.1f}s", flush=True)

    from cluster_generator_tpu.parallel import sample_ensemble_params
    from cluster_generator_tpu.parallel.ensemble import ensemble_datagen

    M, c = sample_ensemble_params(jax.random.key(7), BATCH)
    out = f"/root/r5_cfg5c_aot_{mode}.h5"
    t0 = time.time()
    ensemble_datagen(M, c, out, COUNTS, batch_size=BATCH,
                     num_points=N_PTS, key=jax.random.key(3),
                     overwrite=True, aot_dir=AOT_DIR,
                     prime_aot=(mode == "prime"))
    dt = time.time() - t0
    print(f"# cfg5c {mode}: {BATCH}-cluster catalog end-to-end in "
          f"{dt:.1f}s ({time.time() - t_start:.1f}s from process start)",
          flush=True)
    print(f"# CFG5C_AOT_{mode.upper()} DONE", flush=True)


if __name__ == "__main__":
    main()
