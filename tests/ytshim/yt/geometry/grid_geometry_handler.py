"""GridIndex: drives the frontend hierarchy build in the same order real
yt does (Index._initialize_index -> _detect_output_fields, then
_setup_geometry -> _count_grids/_parse_index/_populate_grid_objects), and
constructs the per-dataset_type IO handler from the registry."""

from __future__ import annotations

from ..utilities.io_handler import io_registry


class GridIndex:
    grid = None

    def __init__(self, ds, dataset_type=None):
        # frontends usually set self.dataset/self.dataset_type before
        # calling super().__init__; fill in whatever they didn't
        if not hasattr(self, "dataset"):
            self.dataset = ds
        if getattr(self, "dataset_type", None) is None:
            self.dataset_type = dataset_type
        self.ds = ds
        self._detect_output_fields()
        self._count_grids()
        self._parse_index()
        self._populate_grid_objects()
        self.io = io_registry[self.dataset_type](ds)

    # frontend must provide these four
    def _detect_output_fields(self):  # pragma: no cover
        raise NotImplementedError

    def _count_grids(self):  # pragma: no cover
        raise NotImplementedError

    def _parse_index(self):  # pragma: no cover
        raise NotImplementedError

    def _populate_grid_objects(self):  # pragma: no cover
        raise NotImplementedError
