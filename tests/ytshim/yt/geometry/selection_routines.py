"""Grid-cell selectors implementing the fill_mask protocol our
AMRGridPatch.select consumes.  Real yt's selectors are Cython
(yt/geometry/selection_routines.pyx); these cover the two shapes the
frontend tests need: select-everything and an axis-aligned box."""

from __future__ import annotations

import numpy as np


class AlwaysSelector:
    def fill_mask(self, grid):
        return np.ones(tuple(grid.ActiveDimensions), dtype=bool)


class RegionSelector:
    """Cells whose centers lie inside [left_edge, right_edge)."""

    def __init__(self, left_edge, right_edge):
        self.left_edge = np.asarray(left_edge, dtype="float64")
        self.right_edge = np.asarray(right_edge, dtype="float64")

    def fill_mask(self, grid):
        centers = grid.icoords_centers()  # (nx, ny, nz, 3)
        inside = np.logical_and(centers >= self.left_edge,
                                centers < self.right_edge).all(axis=-1)
        return inside


class SphereSelector:
    """Cells whose centers lie within ``radius`` of ``center`` (real yt's
    most-used data object, yt/geometry/selection_routines.pyx
    SphereSelector.select_cell semantics: cell-center membership)."""

    def __init__(self, center, radius):
        self.center = np.asarray(center, dtype="float64")
        self.radius = float(radius)

    def fill_mask(self, grid):
        centers = grid.icoords_centers()
        d2 = ((centers - self.center) ** 2).sum(axis=-1)
        return d2 <= self.radius * self.radius
