"""Chunk-batched fluid I/O for the yt frontend
(reference frontend/io.py:15-110): consecutive grid ids are read as one
HDF5 hyperslab, then distributed to selectors."""

from __future__ import annotations

from itertools import groupby

import numpy as np
from yt.utilities.io_handler import BaseIOHandler

_FLUID = "cluster_generator"


def grid_sequences(grids):
    """Yield runs of grids with consecutive ids (already id-sorted)."""
    for _k, g in groupby(enumerate(grids), lambda i_x: i_x[0] - i_x[1].id):
        yield [v[1] for v in g]


class ClusterGeneratorIOHandler(BaseIOHandler):
    _particle_reader = False
    _dataset_type = _FLUID

    def __init__(self, ds):
        super().__init__(ds)
        self._handle = ds._handle

    def _read_particle_coords(self, chunks, ptf):
        pass  # grid datasets carry no particles

    def _read_particle_fields(self, chunks, ptf, selector):
        pass

    def _read_fluid_selection(self, chunks, selector, fields, size):
        chunks = list(chunks)
        if any(ftype != self._dataset_type for ftype, _ in fields):
            raise NotImplementedError(
                f"One of the field types is not valid for dataset type "
                f"{self._dataset_type}.")
        out = {field: np.empty(size, dtype="=f8") for field in fields}
        for field in fields:
            _, fname = field
            ds = self._handle[f"grid/{fname}"]
            ind = 0
            for chunk in chunks:
                for gs in grid_sequences(chunk.objs):
                    start = gs[0].id - gs[0]._id_offset
                    end = gs[-1].id - gs[-1]._id_offset + 1
                    data = ds[start:end, :, :, :].transpose()
                    for i, g in enumerate(gs):
                        ind += g.select(selector, data[..., i], out[field],
                                        ind)
        return out

    def _read_chunk_data(self, chunk, fields):
        out = {}
        if len(chunk.objs) == 0:
            return out
        for g in chunk.objs:
            out[g.id] = {}
        for field in fields:
            _, fname = field
            ds = self._handle[f"grid/{fname}"]
            for gs in grid_sequences(chunk.objs):
                start = gs[0].id - gs[0]._id_offset
                end = gs[-1].id - gs[-1]._id_offset + 1
                buf = ds[start:end, :, :, :].transpose()
                for i, g in enumerate(gs):
                    out[g.id][field] = buf[..., i]
        return out
