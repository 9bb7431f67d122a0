"""HDF5FileHandler: a held-open h5py.File with attrs/getitem passthrough,
matching the surface yt's version exposes."""

from __future__ import annotations

import h5py


class HDF5FileHandler:
    handle = None

    def __init__(self, filename):
        self.handle = h5py.File(filename, "r")

    def __getitem__(self, key):
        return self.handle[key]

    def __contains__(self, item):
        return item in self.handle

    def __len__(self):
        return len(self.handle)

    @property
    def attrs(self):
        return self.handle.attrs

    def keys(self):
        return list(self.handle.keys())

    def close(self):
        if self.handle is not None:
            self.handle.close()
