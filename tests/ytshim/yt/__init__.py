"""Minimal structural stand-in for the parts of yt's frontend ABI that
cluster_generator_tpu.frontend touches.

yt itself is not installable in this image (no network egress), but the
frontend plugin (~350 LoC) must be *executed*, not just written — so this
shim reimplements, from yt's documented frontend interface (yt 4.x:
``Dataset``/``GridIndex``/``AMRGridPatch``/``BaseIOHandler``/
``FieldInfoContainer``), exactly the call sequence real yt drives:

  yt.load -> _is_valid sniffing over registered Dataset subclasses
  Dataset.__init__ -> _parse_parameter_file + _set_code_unit_attributes
  ds.index -> Hierarchy: _count_grids/_parse_index/_populate_grid_objects/
              _detect_output_fields, grids _prepare_grid/_setup_dx,
              io handler from the per-dataset_type registry
  reads    -> IOHandler._read_fluid_selection(chunks, selector, ...)
              with grid.select(selector, cube, dest, offset) semantics

Tests add this directory to sys.path; production code never imports it.
"""

from .data_objects.static_output import Dataset, _dataset_registry
from .loaders import load

__version__ = "0.0-shim"
__all__ = ["load", "Dataset", "_dataset_registry"]
