"""Reference-package loader for golden-parity testing.

The upstream `cluster_generator` (at /root/reference) needs unyt, yt,
more_itertools, ruamel.yaml and two compiled Cython modules
(`cluster_generator.opt.{cython_utils,structures}`, whose .pyx sources are
absent from the snapshot — setup.py:10-23).  None of these are installable
in this image, so this package provides shims:

* pure-numpy `unyt` / `yt.utilities.cosmology` / `ruamel.yaml` /
  `more_itertools` stand-ins (sibling packages here), sharing the SI
  anchors of cluster_generator_tpu.core.constants;
* numpy implementations of the four Cython symbols, reconstructed from
  their call sites (SURVEY.md §2.2): `generate_velocities` (per-particle
  rejection sampling of the Eddington DF), `div_clean` (the exact math is
  preserved upstream in a commented block, fields.py:164-185),
  `construct_chunks`, `dump_field_to_hdf5`.

`load_reference()` wires everything into sys.modules and returns the
imported upstream package.  TEST INFRASTRUCTURE ONLY — nothing here ships
with cluster_generator_tpu, and nothing in the compute path depends on it.
"""

from __future__ import annotations

import pathlib
import sys
import types

SHIM_DIR = str(pathlib.Path(__file__).resolve().parent)
REF_DIR = "/root/reference"


def _opt_cython_utils():
    import numpy as np
    from scipy.interpolate import splev

    mod = types.ModuleType("cluster_generator.opt.cython_utils")

    def generate_velocities(psi, vesc, fv2esc, t, c, k, no_pbar=1,
                            _seed=987654321):
        """Rejection-sample particle speeds from the Eddington DF
        (contract per reference virial.py:198-206): accept v ~ U(0, vesc)
        when u * fv2esc <= v^2 f(psi - v^2/2), f evaluated as the FITPACK
        B-spline (t, c, k).  Vectorized numpy; fixed seed for
        deterministic goldens; the seed must NOT collide with the seeds
        callers use for their position draws (a shared MT19937 stream
        correlates v with the radius quantile and skews the joint
        distribution — bitten once with _seed=25).  The Cython original's
        internal RNG state is not recoverable — cross-package particle parity is by
        distribution, not bitwise; SURVEY.md §7 hard part (e))."""
        rng = np.random.RandomState(_seed)
        psi = np.asarray(psi, dtype=np.float64)
        n = psi.shape[0]
        out = np.empty(n)
        todo = np.arange(n)
        # the caller passes get_knots()/get_coeffs() — the UNIQUE knots;
        # rebuild the full FITPACK knot vector (ends repeated k+1 times)
        # or splev evaluates a different spline entirely
        k = int(k)
        t = np.asarray(t, dtype=np.float64)
        c = np.asarray(c, dtype=np.float64)
        t_full = np.concatenate([np.repeat(t[0], k), t, np.repeat(t[-1], k)])
        c_full = np.concatenate([c, np.zeros(len(t_full) - k - 1 - len(c))])
        tck = (t_full, c_full, k)
        while todo.size:
            v = rng.uniform(size=todo.size) * vesc[todo]
            u = rng.uniform(size=todo.size)
            fval = splev(psi[todo] - 0.5 * v * v, tck)
            accept = u * fv2esc[todo] <= v * v * fval
            out[todo[accept]] = v[accept]
            todo = todo[~accept]
        return out

    def div_clean(gx, gy, gz, kx, ky, kz, deltas):
        """In-place k-space divergence projection with finite-difference
        wavenumbers — the numpy math preserved upstream in the commented
        block fields.py:164-185."""
        kxd = np.sin(kx * deltas[0]) / deltas[0]
        kyd = np.sin(ky * deltas[1]) / deltas[1]
        kzd = np.sin(kz * deltas[2]) / deltas[2]
        kkd = np.sqrt(kxd * kxd + kyd * kyd + kzd * kzd)
        with np.errstate(invalid="ignore", divide="ignore"):
            kxd /= kkd
            kyd /= kkd
            kzd /= kkd
        np.nan_to_num(kxd, posinf=0, neginf=0, copy=False)
        np.nan_to_num(kyd, posinf=0, neginf=0, copy=False)
        np.nan_to_num(kzd, posinf=0, neginf=0, copy=False)
        kb = kxd * gx + kyd * gy + kzd * gz
        gx -= kxd * kb
        gy -= kyd * kb
        gz -= kzd * kb

    mod.generate_velocities = generate_velocities
    mod.div_clean = div_clean
    return mod


def _opt_structures():
    import numpy as np
    from scipy.interpolate import splev

    mod = types.ModuleType("cluster_generator.opt.structures")

    def construct_chunks(domain_dimensions, chunksize):
        """uint32[3, 2, Nchunks] of per-chunk (min, max) cell indices
        tiling the domain in chunksize cubes (shape inferred from
        frontend/data_structures.py:97-101)."""
        nx, ny, nz = (int(d) // int(chunksize) for d in domain_dimensions)
        cs = int(chunksize)
        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij")
        mins = np.stack([ii.ravel(), jj.ravel(), kk.ravel()]) * cs
        out = np.empty((3, 2, mins.shape[1]), dtype=np.uint32)
        out[:, 0, :] = mins
        out[:, 1, :] = mins + cs
        return out

    def dump_field_to_hdf5(h5_dset, bbox, domain_dimensions, chunkmap,
                           t, c, k, fieldname):
        """Per chunk: cell-center coords from the cluster-relative bbox,
        r = |x|, FITPACK spline eval of the radial profile, write the
        (cs, cs, cs) block into slot [chunk_id] (data_structures.py:399)."""
        bbox = np.asarray(bbox, dtype=np.float64)
        dd = np.asarray(domain_dimensions, dtype=np.int64)
        widths = (bbox[:, 1] - bbox[:, 0]) / dd
        n = int(np.asarray(t).size)
        tck = (np.asarray(t), np.asarray(c), int(k))
        nch = chunkmap.shape[-1]
        for ci in range(nch):
            lo = chunkmap[:, 0, ci].astype(np.int64)
            hi = chunkmap[:, 1, ci].astype(np.int64)
            axes = [bbox[a, 0] + (np.arange(lo[a], hi[a]) + 0.5) * widths[a]
                    for a in range(3)]
            X, Y, Z = np.meshgrid(*axes, indexing="ij")
            r = np.sqrt(X * X + Y * Y + Z * Z)
            vals = splev(r.ravel(), tck).reshape(r.shape)
            # z-first rows on disk: the reference's yt reader transposes
            # each chunk row back to an x-first cube (frontend/io.py:81),
            # so the Cython painter must have written block[k][j][i].
            h5_dset[ci, ...] += vals.transpose(2, 1, 0)
        del n

    mod.construct_chunks = construct_chunks
    mod.dump_field_to_hdf5 = dump_field_to_hdf5
    return mod


def load_reference():
    """Import and return the upstream cluster_generator against the shims."""
    if "cluster_generator" in sys.modules:
        return sys.modules["cluster_generator"]
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    if REF_DIR not in sys.path:
        sys.path.insert(1, REF_DIR)

    # scipy removed `scipy.interpolate.dfitpack` (the reference notes the
    # deprecation itself, data_structures.py:395-396); shim the one symbol
    # it uses — fpcurf0, whose (k, n, t, c) outputs splrep reproduces
    # (splrep IS the supported wrapper of fpcurf).
    import scipy.interpolate as _si

    dfit = types.ModuleType("scipy.interpolate.dfitpack")

    def fpcurf0(x, y, k, w=None, xb=None, xe=None, s=0.0):
        from scipy.interpolate import splrep

        t, c, kk = splrep(x, y, w=w, xb=xb, xe=xe, k=k, s=s)
        out = [None] * 14
        out[5], out[7], out[8], out[9] = kk, len(t), t, c
        return tuple(out)

    dfit.fpcurf0 = fpcurf0
    sys.modules["scipy.interpolate.dfitpack"] = dfit
    _si.dfitpack = dfit

    opt = types.ModuleType("cluster_generator.opt")
    opt.__path__ = []  # mark as package
    cy = _opt_cython_utils()
    st = _opt_structures()
    opt.cython_utils = cy
    opt.structures = st
    sys.modules["cluster_generator.opt"] = opt
    sys.modules["cluster_generator.opt.cython_utils"] = cy
    sys.modules["cluster_generator.opt.structures"] = st

    import cluster_generator  # noqa: E402

    cluster_generator.opt = opt
    return cluster_generator
