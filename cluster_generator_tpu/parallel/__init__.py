"""Multi-chip scaling layer: device meshes, ensemble vmap/shard_map."""

from .mesh import make_mesh
from .ensemble import (build_ensemble, ensemble_datagen, read_catalog,
                       sample_ensemble_params)

__all__ = ["make_mesh", "build_ensemble", "ensemble_datagen",
           "read_catalog", "sample_ensemble_params"]
