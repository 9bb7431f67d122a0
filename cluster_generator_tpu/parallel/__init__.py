"""Multi-chip scaling layer: device meshes, ensemble vmap/shard_map."""

from .mesh import make_mesh
from .ensemble import (build_ensemble, catalog_batches,
                       catalog_to_particles, datagen_batches,
                       ensemble_datagen, ensemble_datagen_multihost,
                       prorate_species_counts, read_catalog,
                       sample_ensemble_params, verify_catalog)
from .mergers import (binary_scene_geometry, halo_mass_weights,
                      merger_datagen, merger_datagen_multihost,
                      read_merger_catalog, sample_merger_scene_params,
                      sample_triple_scene_params, scene_to_particles,
                      triple_scene_geometry, verify_merger_catalog)

__all__ = ["make_mesh", "build_ensemble", "catalog_batches",
           "catalog_to_particles", "datagen_batches", "ensemble_datagen",
           "ensemble_datagen_multihost", "prorate_species_counts",
           "read_catalog", "sample_ensemble_params", "verify_catalog",
           "binary_scene_geometry", "halo_mass_weights", "merger_datagen",
           "merger_datagen_multihost", "read_merger_catalog",
           "sample_merger_scene_params", "sample_triple_scene_params",
           "scene_to_particles", "triple_scene_geometry",
           "verify_merger_catalog"]
