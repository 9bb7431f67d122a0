"""Vmapped ensemble datagen: hundreds of equilibrium clusters per launch.

On a multi-chip mesh, shard the parameter batch over the 'ens' axis and
each device builds its shard with zero communication.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cluster_generator_tpu.parallel import (
    build_ensemble,
    make_mesh,
    sample_ensemble_params,
)

import os
B = max(8, int(256 / float(os.environ.get("CG_EXAMPLE_SCALE", "1"))))
M200, conc = sample_ensemble_params(jax.random.key(0), B)

mesh = make_mesh()  # all devices on the ensemble axis
from jax.sharding import NamedSharding, PartitionSpec as P

sharding = NamedSharding(mesh, P("ens"))
M200 = jax.device_put(M200, sharding)
conc = jax.device_put(conc, sharding)

fields = build_ensemble(M200, conc, num_points=512)
T = np.asarray(fields["temperature"])
print(f"built {B} clusters: kT range "
      f"{T.max(axis=1).min():.2f}..{T.max(axis=1).max():.2f} keV")
print("every f(E) >= 0:", bool((np.asarray(fields['dm_df']) >= 0).all()))

# Full DATAGEN: stream every cluster's draws to one HDF5 catalog
# (group per cluster).  An int count draws DM phase space (254
# clusters/s at 1e5 each on one v5e); a dict draws the complete
# full-species product -- DM + stars with per-species Eddington DFs,
# gas with thermal energies (218 clusters/s); see docs/parallel.md.
import tempfile

from cluster_generator_tpu.parallel import ensemble_datagen

with tempfile.TemporaryDirectory() as td:
    fn = ensemble_datagen(M200[:8], conc[:8], f"{td}/catalog.h5",
                          20_000, batch_size=8, num_points=256,
                          key=jax.random.key(1))
    import h5py

    with h5py.File(fn) as f:
        print(f"datagen catalog: {f.attrs['n_clusters']} clusters x "
              f"{f.attrs['n_particles_per_cluster']} particles")

    # full-species variant: every species per cluster in one program
    fn2 = ensemble_datagen(M200[:4], conc[:4], f"{td}/full.h5",
                           {"dm": 10_000, "gas": 8_000, "star": 2_000},
                           batch_size=4, num_points=256,
                           key=jax.random.key(2))
    with h5py.File(fn2) as f:
        g = f["cluster_000000"]
        print("full-species datasets:", sorted(g.keys()))

    # consume it back (raw-pread fast path, ~6x h5py)
    from cluster_generator_tpu.parallel import read_catalog

    for i, cl in read_catalog(fn2, indices=[0, 2]):
        print(f"cluster {i}: M200={cl['M200']:.3e}, "
              f"dm={cl['dm_position'].shape}, "
              f"e_gas range=({cl['gas_thermal_energy'].min():.3g}, "
              f"{cl['gas_thermal_energy'].max():.3g})")

    # training-loop form: shuffled stacked batches with prefetch
    from cluster_generator_tpu.parallel import catalog_batches

    for batch in catalog_batches(fn2, 2, key=jax.random.key(3)):
        x = jnp.asarray(batch["dm_position"])   # (2, 10000, 3)
        print(f"train batch: dm {x.shape}, M200 {batch['M200']}")

    # physics QA gate before training on a catalog: rebuild each model
    # and check the draws (finite, r in grid, v < v_esc, e = 1.5 P/rho)
    from cluster_generator_tpu.parallel import verify_catalog

    rep = verify_catalog(fn2, indices=[0, 1])
    print(f"QA: {rep['n_particles_checked']} particles, "
          f"max v/v_esc {rep['max_speed_frac']:.4f}, "
          f"violations: {len(rep['violations'])}")
