"""AMRGridPatch: one grid patch whose geometry is copied out of the index
arrays by _prepare_grid/_setup_dx, plus yt's grid.select(selector, source,
dest, offset) read protocol."""

from __future__ import annotations

import numpy as np


class AMRGridPatch:
    _id_offset = 1

    def __init__(self, id, filename=None, index=None):
        self.id = id
        self.filename = filename
        self.index = index
        self.ActiveDimensions = None
        self.LeftEdge = None
        self.RightEdge = None
        self.dds = None
        self.NumberOfParticles = 0

    def _prepare_grid(self):
        """Copy this grid's geometry out of the index's flat arrays."""
        h = self.index
        i = self.id - self._id_offset
        self.ActiveDimensions = np.asarray(h.grid_dimensions[i],
                                           dtype="int64")
        self.LeftEdge = np.asarray(h.grid_left_edge[i], dtype="float64")
        self.RightEdge = np.asarray(h.grid_right_edge[i], dtype="float64")
        self.NumberOfParticles = int(h.grid_particle_count[i, 0])

    def _setup_dx(self):
        self.dds = ((self.RightEdge - self.LeftEdge)
                    / self.ActiveDimensions.astype("float64"))

    # ------------------------------------------------------ read protocol
    def select(self, selector, source, dest, offset):
        """Write this grid's selected cells of ``source`` (an (nx, ny, nz)
        cube, x-first) into ``dest[offset:]``; return the count."""
        mask = selector.fill_mask(self)
        if mask is None:
            return 0
        count = int(mask.sum())
        dest[offset:offset + count] = np.asarray(source)[mask]
        return count

    def count(self, selector):
        mask = selector.fill_mask(self)
        return 0 if mask is None else int(mask.sum())

    def icoords_centers(self):
        """Physical cell-center coordinates, shape (nx, ny, nz, 3)."""
        nx, ny, nz = self.ActiveDimensions
        ii = self.LeftEdge[0] + (np.arange(nx) + 0.5) * self.dds[0]
        jj = self.LeftEdge[1] + (np.arange(ny) + 0.5) * self.dds[1]
        kk = self.LeftEdge[2] + (np.arange(nz) + 0.5) * self.dds[2]
        return np.stack(np.meshgrid(ii, jj, kk, indexing="ij"), axis=-1)
