"""Chunked uniform-grid HDF5 datasets for yt consumption
(reference data_structures.py:28-401).

The reference's two Cython kernels (``opt.structures.construct_chunks`` and
``opt.structures.dump_field_to_hdf5``, SURVEY.md §2.2) become:

* ``construct_chunks`` — pure index arithmetic (numpy, with an optional C++
  fast path in ``native/``);
* chunk painting — a *batched on-device* evaluation: for each 64^3 chunk the
  cell radii and the cubic-spline field interpolation run as one jitted XLA
  program; only the finished (cs, cs, cs) block is DMA'd to the host and
  written into the chunked HDF5 dataset ("disk as VRAM", model.py:1166-1168).
"""

from __future__ import annotations

import os
import pathlib as pt
from functools import partial

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from .core import constants as C
from .core.h5raw import RawSlabIO, create_early_alloc
from .core.interp import cubic_spline, spline_eval
from .core.logging import mylog

__all__ = ["YTHDF5", "construct_chunks"]


def construct_chunks(domain_dimensions, chunksize: int) -> np.ndarray:
    """Chunkmap ``uint32[3, 2, Nchunks]`` of per-chunk (min, max) cell
    indices tiling the domain in cubes (reference opt.structures
    .construct_chunks, called from data_structures.py:238)."""
    try:
        from .ops.native import construct_chunks as _native_chunks

        return _native_chunks(domain_dimensions, chunksize)
    except Exception:
        pass
    dd = np.asarray(domain_dimensions, dtype=np.uint32)
    counts = (dd // chunksize).astype(int)
    ii, jj, kk = np.meshgrid(np.arange(counts[0]), np.arange(counts[1]),
                             np.arange(counts[2]), indexing="ij")
    starts = np.stack([ii.ravel(), jj.ravel(), kk.ravel()],
                      axis=0).astype(np.uint32) * np.uint32(chunksize)
    ends = starts + np.uint32(chunksize)
    return np.stack([starts, ends], axis=1)  # (3, 2, Nchunks)


# raw-I/O helpers shared with the ensemble catalog writer; the alias
# keeps this module's name for the painter's streaming pattern
_create_early_alloc = create_early_alloc
_RawSlabIO = RawSlabIO


@partial(jax.jit, static_argnames=("cs",))
def _paint_chunk(sp, start, deltas, left_edge, cs):
    """Evaluate a radial spline field on one chunk's cell centers.

    start: (3,) first cell index of the chunk; returns (cs, cs, cs) in the
    on-disk z-first layout block[k, j, i] = f(x_i, y_j, z_k) — the
    orientation the reference's yt frontend reader decodes (it transposes
    each chunk row before handing yt an x-first cube, reference
    frontend/io.py:81)."""
    idx = jnp.arange(cs, dtype=jnp.float64)
    x = left_edge[0] + (start[0] + idx + 0.5) * deltas[0]
    y = left_edge[1] + (start[1] + idx + 0.5) * deltas[1]
    z = left_edge[2] + (start[2] + idx + 0.5) * deltas[2]
    rr = jnp.sqrt(z[:, None, None] ** 2 + y[None, :, None] ** 2
                  + x[None, None, :] ** 2)
    # cells beyond the model's radial grid hold the boundary value rather
    # than cubic-extrapolating (the reference's FITPACK eval extrapolates
    # and its densities can go NEGATIVE in the bbox corners when the box
    # circumscribes r_max — an inherited bug this rebuild fixes)
    rr = jnp.clip(rr, sp.x[0], sp.x[-1])
    return spline_eval(sp, rr)


def _paint_config_digest(model, center, velocity):
    """sha256 of everything that shapes a painted field's values —
    recorded by the first ``add_model`` so ``resume=True`` can refuse a
    call whose completed-field splice would mix two configurations."""
    import hashlib

    h = hashlib.sha256()
    h.update(np.asarray(center, np.float64).tobytes())
    h.update(np.asarray(velocity, np.float64).tobytes())
    h.update(np.asarray(model["radius"], np.float64).tobytes())
    for name in sorted(model.fields):
        h.update(name.encode())
        h.update(np.ascontiguousarray(
            np.asarray(model[name], np.float64)).tobytes())
    # the convention changes the painted magnetic_pressure values
    h.update(b"gaussian" if getattr(model, "magnetic_gaussian", True)
             else b"lorentz-heaviside")
    return h.hexdigest()


class YTHDF5:
    """Wrapper for the chunked-grid HDF5 files yt reads back
    (data_structures.py:62-401)."""

    _yt_fields = {
        "density": "Msun/kpc**3",
        "dark_matter_density": "Msun/kpc**3",
        "stellar_density": "Msun/kpc**3",
        "pressure": "Msun/(kpc*Myr**2)",
        "momentum_density_x": "Msun/(Myr*kpc**2)",
        "momentum_density_y": "Msun/(Myr*kpc**2)",
        "momentum_density_z": "Msun/(Myr*kpc**2)",
        "magnetic_pressure": "Msun/(kpc*Myr**2)",
    }

    def __init__(self, filename):
        self.filename = pt.Path(filename)
        assert self.filename.exists(), \
            f"The file {self.filename} doesn't appear to exist."
        with h5py.File(self.filename, "r") as fo:
            self.chunkmap = fo["chunks"]["chunkmap"][:]
            self._attrs = dict(fo.attrs)
            ds = next(iter(fo["grid"].values()), None)
            self._itemsize = 8 if ds is None else ds.dtype.itemsize

    def __str__(self):
        return f"<YTHDF5 File @ {self.filename}>"

    __repr__ = __str__

    @property
    def domain_dimensions(self):
        return self._attrs["domain_dimensions"]

    @property
    def bbox(self):
        return self._attrs["bbox"]

    @property
    def chunksize(self):
        return int(self._attrs["chunksize"])

    @property
    def model_count(self):
        with h5py.File(self.filename, "r") as fo:
            return int(fo.attrs["model_count"])

    @classmethod
    def load(cls, filename):
        return cls(filename)

    @classmethod
    def build(cls, filename, domain_dimensions=(512, 512, 512), bbox=None,
              overwrite=False, chunksize=64, dtype="f8"):
        """Create the chunked HDF5 schema (data_structures.py:145-251).

        ``dtype``: on-disk float width for the field datasets — "f8"
        (default; byte-layout-compatible with the reference writer) or
        "f4".  The 512^3 x 8-field build is sustained-disk-bound
        (~0.2 GB/s measured here), so "f4" halves the build wall time
        at float32 precision — ample for visualization/yt consumption."""
        filename = pt.Path(filename)
        if dtype not in ("f8", "f4"):
            raise ValueError(f"dtype must be 'f8' or 'f4', got {dtype!r}")
        domain_dimensions = np.array(domain_dimensions, dtype="uint32")
        if bbox is None:
            bbox = np.array([[0, 1]] * 3, dtype="float64")
        bbox = np.asarray(bbox, dtype="float64")
        assert np.array_equal(domain_dimensions % chunksize, np.zeros(3)), \
            ("The chunksize does not evenly divide the domain. Please alter "
             "your chunksize so that it fits.")
        if filename.exists() and not overwrite:
            raise IOError(f"Could not create YTHDF5 object at {filename} "
                          "because it already exists.")
        elif filename.exists():
            mylog.info("%s exists. Overwriting it...", filename)
            filename.unlink()

        with h5py.File(filename, "w") as buf:
            buf.attrs["domain_dimensions"] = domain_dimensions
            buf.attrs["bbox"] = bbox
            buf.attrs["chunksize"] = chunksize
            buf.attrs["model_count"] = 0
            # the MEAN molecular weight: the yt frontend derives
            # T = (P/rho) mu m_p / k_B from this attr, and the models'
            # own temperature uses C.mu (builders.py:125).  The
            # reference writes mu_e here (data_structures.py:232), so
            # its yt temperatures come out mue/mu ~ 1.93x hotter than
            # its models' — an inherited inconsistency, fixed.
            buf.attrs["mu"] = C.mu
            grid = buf.create_group("grid")
            chunks = buf.create_group("chunks")
            chunkmap = construct_chunks(domain_dimensions, chunksize)
            chunks.create_dataset("chunkmap", data=chunkmap, dtype="uint32")
            for field, unit in cls._yt_fields.items():
                ds = _create_early_alloc(
                    grid, field, (chunkmap.shape[-1], chunksize, chunksize,
                                  chunksize), dtype=dtype)
                ds.attrs["unit"] = unit
        return cls.load(filename)

    # --------------------------------------------------------------- sizes
    @property
    def _estimated_size(self):
        return (np.prod(np.array(self.domain_dimensions)) * self._itemsize
                * len(self._yt_fields) / 1e9)

    @property
    def _estimated_chunk_memory(self):
        return (self.chunksize**3) * self._itemsize / 1e9

    def survey_memory(self):
        """Memory/disk usage survey (data_structures.py:266-296)."""
        mylog.info("MEMORY SURVEY: %s.", self.filename)
        mylog.info("Total size: %s GB.",
                   np.round(self._estimated_size, decimals=4))
        mylog.info("Chunk size: %s GB.",
                   np.round(self._estimated_chunk_memory, decimals=4))
        try:
            import psutil

            avail = psutil.virtual_memory().available / 1e9
            mylog.info("Free memory: %s GB", np.round(avail, decimals=3))
            if avail < self._estimated_chunk_memory:
                mylog.warning("Free memory may be insufficient for chunked "
                              "operations.")
        except ImportError:
            pass

    # -------------------------------------------------------------- adding
    def add_model(self, model, center, velocity, engine: str = "device",
                  resume: bool = False):
        """Paint a ClusterModel onto the grid (data_structures.py:298-362).

        engine: "device" evaluates chunks on the accelerator (default);
        "native" uses the multithreaded C++ painter
        (ops/native.cg_paint_radial_chunks) — useful when the accelerator
        is busy or absent.

        resume: restart an interrupted FIRST add_model on this grid —
        fields recorded as complete are skipped, the in-flight one is
        repainted whole (field writes are idempotent on a fresh grid).
        Only valid while ``model_count == 0``: later models ACCUMULATE
        into the datasets, and a partially-accumulated field cannot be
        told apart from a finished one, so resuming there would
        double-count — it raises instead.  The (model, center,
        velocity) configuration is digested into the file on the first
        call and must match on resume: completed fields are kept
        verbatim, so resuming with, say, a corrected bulk velocity
        would silently mix momenta scaled by the OLD velocity with
        fields from the new call.  Multi-GB builds are
        sustained-disk-bound (~1-10 min; docs/performance.md), which is
        exactly when a crash would otherwise cost the whole build."""
        center = np.asarray(center, dtype=np.float64)
        velocity = np.asarray(velocity, dtype=np.float64)
        bbox = np.asarray(self.bbox)
        relative_bbox = bbox - center.reshape(3, 1)
        mylog.info("Adding %s to %s", model, self)

        rr = np.asarray(model["radius"])
        cs = self.chunksize
        chunk_starts = self.chunkmap[:, 0, :].T.astype(np.float64)  # (Nc, 3)
        deltas = (bbox[:, 1] - bbox[:, 0]) / np.asarray(self.domain_dimensions)
        left = relative_bbox[:, 0]

        digest = _paint_config_digest(model, center, velocity)
        with h5py.File(self.filename, "a") as fo:
            if resume:
                if int(fo.attrs["model_count"]) != 0:
                    raise ValueError(
                        "resume=True is only valid for the FIRST model "
                        "on a grid: later models accumulate into the "
                        "datasets and a partially-accumulated field "
                        "cannot be detected — rebuild instead")
                have = fo.attrs.get("_paint_config")
                if have is None:
                    mylog.warning(
                        "%s predates the paint-config digest; resume "
                        "cannot verify this call matches the "
                        "interrupted one", self.filename)
                elif have != digest:
                    raise ValueError(
                        "resume=True with a different (model, center, "
                        "velocity) than the interrupted add_model: "
                        "completed fields would keep the OLD "
                        "configuration — rebuild instead")
                done = set(fo.attrs.get("_fields_done", ()))
                if done:
                    mylog.info("Resuming: %d field(s) already painted.",
                               len(done))
            else:
                done = set()
                fo.attrs["_fields_done"] = []
                fo.attrs["_paint_config"] = digest
            for field, unit in self._yt_fields.items():
                extra_scaled = []
                if field in done or "momentum_density" in field:
                    # momenta are written as scaled copies of the
                    # density paint below; done fields were painted by
                    # the interrupted run
                    continue
                elif field == "density":
                    if field in model.fields:
                        # momentum_density_{x,y,z} = density * v_bulk[axis]:
                        # reuse the density blocks instead of repainting
                        # the same spline three more times (8 -> 5 paints;
                        # on the device engine, 3/8 less D2H traffic too)
                        extra_scaled = [
                            (f"momentum_density_{ax}", velocity[i])
                            for i, ax in enumerate("xyz")]
                    yy = np.asarray(model[field]) if field in model.fields \
                        else None
                    if yy is None:
                        mylog.debug("Field %s not in model; skipping.",
                                    field)
                        continue
                elif field == "magnetic_pressure":
                    if "magnetic_field_strength" not in model.fields:
                        continue
                    # p_B = B^2/(8 pi) in the Gaussian convention,
                    # B^2/2 in Lorentz-Heaviside — honor however the
                    # model's field was set (default gaussian, like the
                    # setters); convert erg/cm^3 -> galactic
                    from .core import units as U

                    B = np.asarray(model["magnetic_field_strength"])
                    if getattr(model, "magnetic_gaussian", True):
                        p_B = B**2 / (8.0 * np.pi)
                    else:
                        p_B = B**2 / 2.0
                    yy = p_B * U.unit_factor("erg/cm**3")
                elif field in model.fields:
                    yy = np.asarray(model[field])
                else:
                    mylog.debug("Field %s not in model; skipping.", field)
                    continue
                self._add_field(fo, rr, yy, field, left, deltas, chunk_starts,
                                cs, engine=engine,
                                accumulate=int(fo.attrs["model_count"]) > 0,
                                extra_scaled=extra_scaled)
                # completion marker AFTER the field (and its scaled
                # momentum copies) hit the file — a crash mid-field
                # leaves it unlisted and a resume repaints it whole
                done.add(field)
                done.update(fn for fn, _ in extra_scaled)
                fo.attrs["_fields_done"] = sorted(done)
                fo.flush()
            mylog.info("Core fields of %s were written to %s.", model, self)
            fo.attrs["model_count"] += 1

    def add_ICs(self, ics):
        """Paint every model of a ClusterICs scene
        (data_structures.py:364-387)."""
        from .model import ClusterModel

        mylog.info("Adding %s to %s.", ics.basename, self)
        for ic_id, ic_model in enumerate(ics.profiles):
            model = ClusterModel.from_h5_file(ic_model)
            self.add_model(model, ics.center[ic_id], ics.velocity[ic_id])

    def _add_field(self, fileio, r, y, fieldname, left, deltas, chunk_starts,
                   cs, batch=64, engine="device", accumulate=True,
                   extra_scaled=()):
        """Evaluate the radial field on every chunk and stream the blocks to
        disk (replaces opt.structures.dump_field_to_hdf5).

        ``accumulate=False`` (first model on a fresh grid) assigns blocks
        directly instead of the read-modify-write ``+=``, halving the disk
        traffic.  The device engine double-buffers: the paint of chunk
        batch k+1 is dispatched (async) BEFORE the blocking
        device-to-host transfer + write of batch k, so host I/O overlaps
        device compute (VERDICT r3 item 2).

        ``extra_scaled``: [(other_fieldname, factor), ...] — datasets that
        are scalar multiples of this field (the momentum densities);
        each painted batch is also written to them as ``factor * blocks``
        without repainting."""
        sp = cubic_spline(jnp.asarray(r), jnp.asarray(y))
        dset = fileio["grid"][fieldname]
        n = chunk_starts.shape[0]
        raw = _RawSlabIO(fileio, dset)
        sinks = [(dset, raw, 1.0)]
        sinks += [(fileio["grid"][fn], _RawSlabIO(fileio, fileio["grid"][fn]),
                   fac) for fn, fac in extra_scaled]

        scratch = [None]  # reused scaled-copy buffer (fresh 100MB+ allocs
        # per batch cost multiples of the paint in page faults)

        def _store(i0, blocks):
            for ds_k, raw_k, fac in sinks:
                if fac == 1.0:
                    blk = blocks
                else:
                    if (scratch[0] is None
                            or scratch[0].shape != blocks.shape):
                        scratch[0] = np.empty_like(blocks)
                    blk = np.multiply(blocks, fac, out=scratch[0])
                if raw_k.eligible:
                    (raw_k.accumulate if accumulate else raw_k.write)(i0, blk)
                elif accumulate:
                    ds_k[i0:i0 + blk.shape[0], ...] += blk
                else:
                    ds_k[i0:i0 + blk.shape[0], ...] = blk

        try:
            if engine == "native":
                from .ops import native

                buf = None
                for i0 in range(0, n, batch):
                    starts = chunk_starts[i0:i0 + batch].astype(np.int64)
                    if buf is None or buf.shape[0] != starts.shape[0]:
                        buf = np.empty((starts.shape[0], cs, cs, cs),
                                       dtype=np.float64)
                    blocks = native.paint_radial_chunks(sp, starts, cs,
                                                        deltas, left,
                                                        out=buf)
                    _store(i0, blocks)
                return
            # when every sink stores f32, cast on device BEFORE the
            # device-to-host transfer — halves the D2H bytes (the device
            # engine is D2H-bound through a tunneled accelerator)
            f32_out = all(ds_k.dtype == np.dtype("<f4") for ds_k, _, _
                          in sinks)

            def _one(s):
                blk = _paint_chunk(sp, s, jnp.asarray(deltas),
                                   jnp.asarray(left), cs)
                return blk.astype(jnp.float32) if f32_out else blk

            paint = jax.vmap(_one)
            pending = None
            for i0 in range(0, n, batch):
                starts = jnp.asarray(chunk_starts[i0:i0 + batch])
                nxt = (i0, paint(starts))  # async dispatch before the write
                if pending is not None:
                    _store(pending[0], np.asarray(pending[1]))
                pending = nxt
            if pending is not None:
                _store(pending[0], np.asarray(pending[1]))
        finally:
            for _, raw_k, _ in sinks:
                raw_k.close()
