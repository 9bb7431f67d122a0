"""Raw-I/O HDF5 helpers (core/h5raw.py): eligibility, fallbacks, and
byte-level agreement with H5Dwrite."""

import h5py
import numpy as np
import pytest

from cluster_generator_tpu.core.h5raw import (
    RawSlabIO,
    RawWriter,
    create_early_alloc,
)


def test_create_early_alloc_offset_and_dtype(tmp_path):
    fn = str(tmp_path / "a.h5")
    with h5py.File(fn, "w") as f:
        d8 = create_early_alloc(f, "x", (4, 8), "f8")
        d4 = create_early_alloc(f, "y", (4, 8), "f4")
        assert d8.id.get_offset() is not None
        assert d4.id.get_offset() is not None
        assert d8.dtype == np.dtype("<f8")
        assert d4.dtype == np.dtype("<f4")
        with pytest.raises(ValueError):
            create_early_alloc(f, "z", (4,), "f2")


def test_rawslabio_roundtrip_and_accumulate(tmp_path):
    fn = str(tmp_path / "b.h5")
    rng = np.random.default_rng(7)
    a = rng.random((6, 5, 4))
    b = rng.random((6, 5, 4))
    with h5py.File(fn, "a") as f:
        ds = create_early_alloc(f, "x", a.shape, "f8")
        raw = RawSlabIO(f, ds)
        assert raw.eligible
        raw.write(0, a[:3])
        raw.write(3, a[3:])
        raw.accumulate(2, b[2:5])
        raw.close()
    with h5py.File(fn) as f:
        got = f["x"][()]
    want = a.copy()
    want[2:5] += b[2:5]
    np.testing.assert_array_equal(got, want)


def test_rawslabio_ineligible_on_chunked_and_compressed(tmp_path):
    fn = str(tmp_path / "c.h5")
    with h5py.File(fn, "a") as f:
        chunked = f.create_dataset("ch", (8, 4), dtype="f8", chunks=(2, 4))
        gz = f.create_dataset("gz", (8, 4), dtype="f8", chunks=(2, 4),
                              compression="gzip")
        i32 = f.create_dataset("i32", (8, 4), dtype="i4")
        assert not RawSlabIO(f, chunked).eligible
        assert not RawSlabIO(f, gz).eligible
        assert not RawSlabIO(f, i32).eligible
        # late-alloc contiguous dataset: no offset until first write
        late = f.create_dataset("late", (8, 4), dtype="f8")
        assert not RawSlabIO(f, late).eligible


def test_rawwriter_matches_h5py_bytes(tmp_path):
    """RawWriter-written datasets read back identical to create_dataset
    with the same arrays, for f4, f8, and the non-float fallback."""
    rng = np.random.default_rng(3)
    arrs = {
        "p32": rng.random((100, 3)).astype(np.float32),
        "p64": rng.random((50,)),
        "ids": np.arange(20, dtype=np.int64),  # falls back to h5py
    }
    fn_raw = str(tmp_path / "raw.h5")
    with h5py.File(fn_raw, "w") as f:
        g = f.create_group("g")
        w = RawWriter(f)
        for k, v in arrs.items():
            w.add(g, k, v)
        w.flush()
    fn_h5 = str(tmp_path / "h5.h5")
    with h5py.File(fn_h5, "w") as f:
        g = f.create_group("g")
        for k, v in arrs.items():
            g.create_dataset(k, data=v)
    with h5py.File(fn_raw) as a, h5py.File(fn_h5) as b:
        for k in arrs:
            np.testing.assert_array_equal(a["g"][k][()], b["g"][k][()],
                                          err_msg=k)
            assert a["g"][k].dtype == b["g"][k].dtype, k


def test_pread_pwrite_all_loop_and_eof(tmp_path):
    """_pread_all/_pwrite_all loop to the full length (a single pwrite is
    capped ~2 GB on Linux and either syscall can return short), and a
    read past EOF raises a clear OSError instead of np.frombuffer's
    obscure size mismatch.  (HDF5 itself refuses to open a truncated
    file, so the raw helpers are the only layer that can hit this.)"""
    import os

    from cluster_generator_tpu.core.h5raw import _pread_all, _pwrite_all

    fn = str(tmp_path / "plain.bin")
    a = np.arange(5000, dtype=np.float64)
    fd = os.open(fn, os.O_RDWR | os.O_CREAT)
    try:
        _pwrite_all(fd, a, 128)
        got = np.frombuffer(_pread_all(fd, a.nbytes, 128), dtype=a.dtype)
        np.testing.assert_array_equal(got, a)
        with pytest.raises(OSError, match="EOF"):
            _pread_all(fd, a.nbytes + 1, 128)  # one byte past EOF
        with pytest.raises(OSError, match="EOF"):
            _pread_all(fd, 8, 128 + a.nbytes)  # entirely past EOF
    finally:
        os.close(fd)


def test_rawwriter_empty_flush(tmp_path):
    fn = str(tmp_path / "e.h5")
    with h5py.File(fn, "w") as f:
        RawWriter(f).flush()  # no-op, must not raise


def test_read_slab_matches_h5py(tmp_path):
    fn = str(tmp_path / "s.h5")
    from cluster_generator_tpu.core.h5raw import read_slab

    a = np.random.default_rng(1).random((10, 4, 3)).astype(np.float32)
    with h5py.File(fn, "w") as f:
        w = RawWriter(f)
        w.add(f, "x", a)
        w.flush()
        ch = f.create_dataset("ch", data=a.astype(np.float64),
                              chunks=(2, 4, 3))
    with h5py.File(fn) as f:
        np.testing.assert_array_equal(read_slab(f["x"], 2, 7), a[2:7])
        np.testing.assert_array_equal(read_slab(f["x"], 0, 10), a)
        # chunked dataset takes the h5py fallback
        np.testing.assert_array_equal(read_slab(f["ch"], 1, 4),
                                      a[1:4].astype(np.float64))
        # hi past the extent clamps like the h5py slice (an un-clamped
        # pread would return the NEXT file object's bytes); negative lo
        # raises (h5py would wrap, raw would read a neighbor — neither
        # silent meaning is safe); empty ranges are empty
        np.testing.assert_array_equal(read_slab(f["x"], 8, 14), a[8:])
        np.testing.assert_array_equal(read_slab(f["ch"], 8, 14),
                                      a[8:].astype(np.float64))
        assert read_slab(f["x"], 7, 7).shape == (0, 4, 3)
        with pytest.raises(ValueError, match="lo"):
            read_slab(f["x"], -1, 2)
        # negative hi raises on BOTH paths: the raw path would return
        # empty where the h5py fallback wraps to dset[0:-1] — the same
        # call must not mean different things per dataset layout
        with pytest.raises(ValueError, match="hi"):
            read_slab(f["x"], 0, -1)
        with pytest.raises(ValueError, match="hi"):
            read_slab(f["ch"], 0, -1)


def test_read_slab_sees_buffered_h5py_writes(tmp_path):
    """Raw reads must observe writes still sitting in h5py/HDF5 buffers
    (the module docstring's flush contract)."""
    from cluster_generator_tpu.core.h5raw import RawReader, read_slab

    fn = str(tmp_path / "b.h5")
    a = np.arange(40, dtype=np.float64).reshape(10, 4)
    with h5py.File(fn, "w") as f:
        w = RawWriter(f)
        d = w.add(f, "x", a)
        w.flush()
        d[3:5] = -a[3:5]  # through h5py, possibly buffered
        got = read_slab(d, 2, 6)
        np.testing.assert_array_equal(got[1:3], -a[3:5])
        r = RawReader(f)
        np.testing.assert_array_equal(r.read(d)[3:5], -a[3:5])
        r.close()
