"""BaseIOHandler with the per-dataset_type registry real yt keeps in
yt/utilities/io_handler.py."""

from __future__ import annotations

io_registry = {}


class BaseIOHandler:
    _dataset_type = None
    _particle_reader = False

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if cls._dataset_type is not None:
            io_registry[cls._dataset_type] = cls

    def __init__(self, ds):
        self.ds = ds
