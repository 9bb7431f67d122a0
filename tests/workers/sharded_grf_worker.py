"""Worker for the two-process sharded-GRF test
(tests/test_parallel_grf.py::test_two_process_sharded_grf).

Two ``jax.distributed`` CPU processes (4 virtual devices each) build one
grid-sharded divergence-free GRF over a global 8-device mesh — the
pencil FFT's all-to-alls cross the process boundary for real.  Each
process saves ONLY its addressable slab chunks plus the field's global
power diagnostics; the parent asserts the slabs tile the grid, the two
processes' globally-reduced diagnostics agree bitwise, and (vs a
single-process reference run with the same key) the assembled field
matches.

Usage: python sharded_grf_worker.py <pid> <nproc> <port> <outdir>
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], Path(sys.argv[4]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from cluster_generator_tpu.parallel.fields import (  # noqa: E402
    sharded_gaussian_random_field,
)

devices = np.array(jax.devices()).reshape(8)
mesh = Mesh(devices, ("ens",))
n = 32
gx, gy, gz = sharded_gaussian_random_field(
    jax.random.key(11), (n, n, n), (10.0, 10.0, 10.0), 40.0, 160.0, mesh,
    g_rms=2.5e-3)

assert len(gx.sharding.device_set) == 8
# globally-reduced diagnostics: identical on every process or the field
# itself diverged between hosts
rms = float(jnp.sqrt(jnp.mean(gx**2 + gy**2 + gz**2)))
gsum = float(jnp.sum(gx) + jnp.sum(gy) + jnp.sum(gz))

slabs = {}
for name, arr in (("gx", gx), ("gy", gy), ("gz", gz)):
    seen = set()
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start in seen:
            continue
        seen.add(start)
        np.save(outdir / f"{name}.{start}.npy", np.asarray(s.data))
    slabs[name] = sorted(seen)

(outdir / f"diag.{pid}.json").write_text(json.dumps(
    {"rms": rms, "gsum": gsum, "slabs": slabs}))
print(f"worker {pid} OK", flush=True)
