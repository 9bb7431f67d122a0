"""Raw-I/O fast paths for contiguous HDF5 datasets.

Plain ``os.pwrite``/``os.pread`` of the dataset bytes at its allocated
file extent runs at page-cache/disk speed with no HDF5 selection or
sieve-buffer machinery in the path.  The measured advantage over
H5Dwrite/H5Dread is HOST-STATE-DEPENDENT on this shared-VM class of
machine: during the round-4 outage window H5Dwrite ran 0.1-0.25 GB/s
(raw = 3-16x); re-measured on the same host healthy, H5Dwrite runs
1.3 GB/s (raw pwrite 2.3 GB/s = 1.8x page-cache, 1.3x durable) and
reads are at parity (benchmarks/measurements_r4/r4ext2_host_io.log,
benchmarks/bench_catalog_io.py).  The raw path is the guaranteed
floor; bytes on disk are identical — every HDF5 reader (h5py, yt, the
reference package) sees the same dataset.

Eligibility is checked per dataset: contiguous (not chunked), no
filters, little-endian f4/f8, allocated offset.  Callers must flush the
owning h5py file before raw access so pending sieve-buffer data cannot
be written back over raw writes (the helpers here do it).

Used by :mod:`..data_structures` (the "disk as VRAM" grid painter) and
:mod:`..parallel.ensemble` (ensemble datagen catalogs) — the two bulk
writers in the package.  The reference has no counterpart (its Cython
``dump_field_to_hdf5`` writes through H5Dwrite, reference
data_structures.py:399).
"""

from __future__ import annotations

import os

import h5py
import numpy as np

__all__ = ["create_early_alloc", "RawSlabIO", "RawWriter", "RawReader",
           "read_slab"]

_H5T = {"f8": h5py.h5t.IEEE_F64LE, "f4": h5py.h5t.IEEE_F32LE}
_RAW_DTYPES = (np.dtype("<f8"), np.dtype("<f4"))


def _pwrite_all(fd, buf, offset):
    """pwrite the whole buffer, looping over short writes (a single
    os.pwrite is capped ~2 GB on Linux and can return short on
    disk-full — ignoring the count would silently corrupt the file)."""
    view = memoryview(buf).cast("B")
    done = 0
    while done < len(view):
        n = os.pwrite(fd, view[done:], offset + done)
        if n <= 0:
            raise OSError(f"pwrite returned {n} at offset {offset + done}"
                          f" ({done}/{len(view)} bytes written)")
        done += n


def _pread_all(fd, nbytes, offset):
    """pread exactly ``nbytes``; raises on EOF-short reads (an
    early-allocated dataset whose extent was never written sits beyond
    the physical EOF — reading it is a caller bug, and a loud error
    beats np.frombuffer's obscure size mismatch)."""
    chunks = []
    done = 0
    while done < nbytes:
        b = os.pread(fd, nbytes - done, offset + done)
        if not b:
            raise OSError(
                f"pread hit EOF at offset {offset + done} "
                f"({done}/{nbytes} bytes): dataset extent not on disk "
                "(unwritten early-alloc dataset?)")
        chunks.append(b)
        done += len(b)
    return chunks[0] if len(chunks) == 1 else b"".join(chunks)


def create_early_alloc(group, name, shape, dtype="f8"):
    """Create a contiguous float dataset whose file extent is allocated
    at creation (no fill written), so writers can stream straight to its
    file offset with os.pwrite.

    ALLOC_TIME_EARLY pins the offset up front; FILL_TIME_NEVER keeps the
    multi-GB create instant (the extent is a hole until written — callers
    are expected to write every byte before readers arrive)."""
    if dtype not in _H5T:
        raise ValueError(f"dtype must be one of {sorted(_H5T)}, "
                         f"got {dtype!r}")
    space = h5py.h5s.create_simple(shape)
    dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
    dcpl.set_alloc_time(h5py.h5d.ALLOC_TIME_EARLY)
    dcpl.set_fill_time(h5py.h5d.FILL_TIME_NEVER)
    did = h5py.h5d.create(group.id, name.encode(), _H5T[dtype], space, dcpl)
    return h5py.Dataset(did)


def _raw_eligible(dset):
    # get_offset() returns None for any non-contiguous storage (chunked,
    # and thus also filtered/compressed — filters require chunking), so
    # one low-level call subsumes the layout checks; the high-level
    # .chunks/.compression properties cost ~0.1 ms each and dominated
    # read_catalog sweeps of many-small-dataset files
    return (dset.id.get_offset() is not None
            and dset.dtype in _RAW_DTYPES)


class RawSlabIO:
    """Raw pread/pwrite of outer-dimension slabs of one contiguous
    dataset (the grid painter's streaming pattern).

    Falls back to ``eligible=False`` (callers use h5py) when the dataset
    is chunked/filtered, a different dtype, or has no allocated offset."""

    def __init__(self, fileio, dset):
        self.dtype = dset.dtype
        self.eligible = _raw_eligible(dset)
        if not self.eligible:
            self.fd = None
            return
        fileio.flush()
        self.offset = dset.id.get_offset()
        self.row_bytes = int(np.prod(dset.shape[1:])) * self.dtype.itemsize
        self.fd = os.open(fileio.filename, os.O_RDWR)

    def write(self, i0, blocks):
        blocks = np.ascontiguousarray(blocks, dtype=self.dtype)
        _pwrite_all(self.fd, blocks, self.offset + i0 * self.row_bytes)

    def accumulate(self, i0, blocks):
        nb = len(blocks) * self.row_bytes
        cur = np.frombuffer(
            _pread_all(self.fd, nb, self.offset + i0 * self.row_bytes),
            dtype=self.dtype).reshape(blocks.shape)
        self.write(i0, cur + blocks)

    def close(self):
        if self.fd is not None:
            os.close(self.fd)
            self.fd = None


class RawWriter:
    """Create-then-pwrite many whole datasets with one fd (the catalog
    writer's pattern: thousands of ~MB-sized per-cluster arrays).

    ``add`` creates an early-allocated dataset for ``arr`` under
    ``group`` and queues the bytes; ``flush`` writes every queued array
    at its dataset offset through a single file descriptor.  Arrays the
    low-level path cannot take (exotic dtypes) are written through h5py
    immediately."""

    def __init__(self, fileio):
        self.fileio = fileio
        self.pairs = []

    def add(self, group, name, arr):
        """Create ``group[name]`` for ``arr`` and queue its bytes;
        returns the dataset (e.g. for attrs).  NOTE: the dataset's DATA
        is not on disk until :meth:`flush` — don't read it back before
        then."""
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.float32:
            dt = "f4"
        elif arr.dtype == np.float64:
            dt = "f8"
        else:
            return group.create_dataset(name, data=arr)
        ds = create_early_alloc(group, name, arr.shape, dt)
        if _raw_eligible(ds):
            self.pairs.append((ds, arr))
        else:  # pragma: no cover - early alloc always yields an offset
            ds[...] = arr
        return ds

    def flush(self):
        if not self.pairs:
            return
        self.fileio.flush()
        fd = os.open(self.fileio.filename, os.O_WRONLY)
        try:
            for ds, arr in self.pairs:
                _pwrite_all(fd, arr, ds.id.get_offset())
        finally:
            os.close(fd)
        self.pairs = []


class RawReader:
    """Whole-dataset pread companion to :class:`RawWriter` (parity with
    H5Dread on a healthy host, up to ~6x when HDF5's read path degrades
    — see the module docstring).  Datasets the raw path cannot take
    fall back to h5py transparently."""

    def __init__(self, fileio):
        self.fileio = fileio
        if fileio.mode != "r":  # pending buffered writes must land first
            fileio.flush()
        self.fd = os.open(fileio.filename, os.O_RDONLY)

    def read(self, dset):
        if not _raw_eligible(dset):
            return dset[()]
        nbytes = dset.size * dset.dtype.itemsize
        buf = _pread_all(self.fd, nbytes, dset.id.get_offset())
        return np.frombuffer(buf, dtype=dset.dtype).reshape(dset.shape)

    def close(self):
        if self.fd is not None:
            os.close(self.fd)
            self.fd = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_slab(dset, lo, hi):
    """``dset[lo:hi]`` (outer-dimension slab) via pread when eligible,
    h5py otherwise.  The returned array may be read-only (zero-copy from
    the pread buffer).

    ``hi`` is clamped to the extent exactly like the h5py slice the
    fallback takes — an un-clamped raw pread past the dataset's extent
    would silently return bytes belonging to whatever object follows it
    in the file.  Negative ``lo``/``hi`` raise: h5py would wrap them to
    the end while the raw path would treat hi<=lo as an empty slab —
    the two paths would return DIFFERENT results for identical
    arguments, so neither silent meaning is safe."""
    if lo < 0 or hi < 0:
        raise ValueError(f"read_slab bounds must be >= 0, got "
                         f"lo={lo}, hi={hi}")
    n = dset.shape[0]
    lo = int(lo)
    hi = min(int(hi), n)
    if not _raw_eligible(dset):
        return dset[lo:hi]
    if hi <= lo:
        return np.empty((0,) + dset.shape[1:], dset.dtype)
    # pending h5py-buffered writes must land before raw access (the
    # module-docstring contract)
    dset.file.flush()
    row = int(np.prod(dset.shape[1:])) * dset.dtype.itemsize
    fd = os.open(dset.file.filename, os.O_RDONLY)
    try:
        buf = _pread_all(fd, (hi - lo) * row,
                         dset.id.get_offset() + lo * row)
    finally:
        os.close(fd)
    return np.frombuffer(buf, dset.dtype).reshape((hi - lo,)
                                                  + dset.shape[1:])
