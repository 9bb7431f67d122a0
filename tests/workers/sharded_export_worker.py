"""Worker for the two-process sharded-export test
(tests/test_parallel.py::test_two_process_sharded_export).

Each process holds 4 virtual CPU devices of a global 8-device
(ens=1, part=8) mesh via ``jax.distributed``, runs the production sharded
merger draw, and writes ONLY its addressable shards of the multi-file
Gadget snapshot — exercising the addressable-vs-global metadata split in
parallel/export.py (shard file numbers from ``devices_indices_map``,
``NumPart_Total``/ID offsets from the collective in-box counts) with
shards this process genuinely cannot read.

Usage: python sharded_export_worker.py <pid> <nproc> <port> <outdir>
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], Path(sys.argv[4]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from cluster_generator_tpu.parallel.export import (  # noqa: E402
    write_sharded_gadget_files,
)
from cluster_generator_tpu.pipeline import (  # noqa: E402
    build_merger_models,
    build_radius_tables,
    build_speed_tables,
    sample_merger_ic_sharded,
)

devices = np.array(jax.devices()).reshape(1, 8)
assert len(jax.local_devices()) == 4, jax.local_devices()
mesh = Mesh(devices, ("ens", "part"))

M2 = jnp.asarray([1.5e15, 1.0e15])
c2 = jnp.asarray([4.0, 5.0])
centers = jnp.asarray([[-500.0, 0.0, 0.0], [500.0, 0.0, 0.0]])
vels = jnp.asarray([[0.1, 0.0, 0.0], [-0.1, 0.0, 0.0]])
rmax = jnp.asarray([3000.0, 3000.0])
fields = build_merger_models(M2, c2, num_points=64)
tables = build_speed_tables(fields)
tables["radius"] = build_radius_tables(fields, rmax)

per = 64 * 8
parts = sample_merger_ic_sharded(
    mesh, fields, tables, centers, vels, rmax, jax.random.key(0),
    (per, per), (per, per), (per, per), axis="part")

# every array must be globally sharded with only 4 addressable shards here
first = next(iter(parts.values()))
assert len(first.sharding.device_set) == 8
assert len({s.index[0].start or 0 for s in first.addressable_shards}) == 4

# box chosen so the clip drops some particles -> the collective-count path
# must agree across processes for headers/IDs to come out consistent
box = 5000.0
files = write_sharded_gadget_files(parts, box, outdir / "ic",
                                   center_offset=[box / 2] * 3)
(outdir / f"wrote.{pid}.json").write_text(
    json.dumps(sorted(f.name for f in files)))
print(f"worker {pid} OK", flush=True)
