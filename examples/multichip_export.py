"""Multi-chip merger IC end to end: sharded draws -> per-host Gadget export.

Every particle array stays sharded along the mesh's 'part' axis from the
draw to the disk: each device samples its share with an independent
fold_in PRNG stream, and each process writes only its addressable shards
as one file of a standard multi-file Gadget snapshot.  On one host this
script still writes n_devices shard files — the exact code path a
multi-host pod runs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from cluster_generator_tpu.parallel.export import write_sharded_gadget_files
from cluster_generator_tpu.particles import ClusterParticles
from cluster_generator_tpu.pipeline import (
    build_merger_models,
    build_radius_tables,
    build_speed_tables,
    sample_merger_ic_sharded,
)

SCALE = float(os.environ.get("CG_EXAMPLE_SCALE", "1"))
n_dev = len(jax.devices())
mesh = Mesh(np.asarray(jax.devices()), ("part",))

M200 = jnp.asarray([1.5e15, 1.0e15])
conc = jnp.asarray([4.0, 5.0])
centers = jnp.asarray([[-1500.0, 0, 0], [1500.0, 0, 0]])
velocities = jnp.asarray([[0.3, 0, 0], [-0.45, 0, 0]])
r_max = jnp.asarray([3000.0, 3000.0])

fields = build_merger_models(M200, conc, num_points=512)
tables = build_speed_tables(fields)
tables["radius"] = build_radius_tables(fields, r_max)

per = max(n_dev, int(2_000_000 / SCALE) // n_dev * n_dev)
per_star = max(n_dev, per // 4 // n_dev * n_dev)  # must divide the mesh too
parts = sample_merger_ic_sharded(
    mesh, fields, tables, centers, velocities, r_max, jax.random.key(11),
    n_gas=(per, per), n_dm=(per, per), n_star=(per_star, per_star))

box = 14_000.0
files = write_sharded_gadget_files(parts, box, "merger_ic",
                                   center_offset=[box / 2] * 3)
print(f"wrote {len(files)} Gadget shard files "
      f"({2 * per:,} gas + {2 * per:,} dm + {2 * per_star:,} star "
      "particles)")

back = ClusterParticles.from_gadget_files(files[0])
print("reassembled:", back)
assert back.num_particles["dm"] == 2 * per
