"""Chunk-batched fluid I/O for the yt frontend.

Grids in our format are HDF5 chunk rows, so any run of consecutive grid ids
can be read as a single hyperslab; ``_iter_hyperslabs`` yields those batched
reads and both selection paths consume it (reference frontend/io.py:15-110
implements the same batching inline per method).
"""

from __future__ import annotations

import numpy as np
from yt.utilities.io_handler import BaseIOHandler

_FLUID = "cluster_generator"


def _iter_hyperslabs(dataset, grids):
    """Yield (grid, data_cube) over id-sorted grids, reading each maximal
    run of consecutive ids as one HDF5 hyperslab."""
    run = []
    for g in grids:
        if run and g.id != run[-1].id + 1:
            yield from _emit(dataset, run)
            run = []
        run.append(g)
    if run:
        yield from _emit(dataset, run)


def _emit(dataset, run):
    lo = run[0].id - run[0]._id_offset
    hi = run[-1].id - run[-1]._id_offset + 1
    # raw pread of the slab when the dataset is contiguous float (no
    # HDF5 selection machinery; parity-to-6x vs H5Dread depending on
    # host state — yt consumption sweeps whole grids)
    from cluster_generator_tpu.core.h5raw import read_slab

    block = read_slab(dataset, lo, hi)
    # On-disk chunk rows are z-first — block[n][k][j][i] = f(x_i, y_j, z_k),
    # the layout the reference's reader decodes (reference frontend/io.py:81
    # transposes each row) — so transpose to the (nx, ny, nz) x-first cube
    # yt's grid.select expects.
    for i, g in enumerate(run):
        yield g, block[i].transpose(2, 1, 0)


class ClusterGeneratorIOHandler(BaseIOHandler):
    _particle_reader = False
    _dataset_type = _FLUID

    def __init__(self, ds):
        super().__init__(ds)
        self._handle = ds._handle

    # grid datasets carry no particles
    def _read_particle_coords(self, chunks, ptf):
        pass

    def _read_particle_fields(self, chunks, ptf, selector):
        pass

    def _read_fluid_selection(self, chunks, selector, fields, size):
        chunks = list(chunks)
        bad = [f for f in fields if f[0] != self._dataset_type]
        if bad:
            raise NotImplementedError(
                f"Field types {bad} not valid for dataset type "
                f"{self._dataset_type}.")
        out = {field: np.empty(size, dtype="=f8") for field in fields}
        for ftype, fname in fields:
            dset = self._handle[f"grid/{fname}"]
            offset = 0
            for chunk in chunks:
                for g, cube in _iter_hyperslabs(dset, chunk.objs):
                    offset += g.select(selector, cube,
                                       out[ftype, fname], offset)
        return out

    def _read_chunk_data(self, chunk, fields):
        out = {g.id: {} for g in chunk.objs}
        for field in fields:
            dset = self._handle[f"grid/{field[1]}"]
            for g, cube in _iter_hyperslabs(dset, chunk.objs):
                out[g.id][field] = cube
        return out
