"""Divergence-free 3D Gaussian random fields (reference fields.py:77-848).

TPU-native redesign:

* Hermitian symmetry of the random modes is obtained *for free* by FFT-ing
  real white noise, replacing the reference's 12-way conjugate index surgery
  (fields.py:463-492) — identical distribution, one ``jnp.fft.fftn``;
* the divergence projection (the Cython ``div_clean`` kernel, SURVEY.md §2.2)
  is a fused jnp expression in k-space using the same finite-difference
  wavenumbers kd = sin(k Δ)/Δ documented in the reference's commented block
  (fields.py:164-185);
* the vector potential is computed directly as A~ = i k x g~ / k^2 (the
  closed form the reference's double-rotation implements, fields.py:192-229);
* everything runs under jit in a configurable dtype (float64 for golden
  accuracy on CPU, float32/complex64 for TPU throughput).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import mylog
from ..sampling import parse_prng

__all__ = ["ClusterField", "GaussianRandomField", "RandomMagneticField",
           "RadialRandomMagneticField", "RandomMagneticVectorPotential",
           "RadialRandomMagneticVectorPotential", "RandomVelocityField",
           "RadialRandomVelocityField", "parse_value"]


def parse_value(value, default_units: str):
    """Coerce a number/array or a ``(value, unit)`` tuple into galactic
    base values (reference fields.py:15-37 `parse_value`, minus unyt)."""
    from ..core import units

    if (isinstance(value, tuple) and len(value) == 2
            and isinstance(value[1], str)):
        return np.asarray(value[0], dtype=np.float64) \
            * units.unit_factor(value[1]) / units.unit_factor(default_units)
    return np.asarray(value, dtype=np.float64)


# ------------------------------------------------------------- jitted cores
@partial(jax.jit, static_argnames=())
def _div_clean_k(gx, gy, gz, kxd, kyd, kzd):
    """Project out the compressive part: g -= khat_d (khat_d . g)."""
    kkd = jnp.sqrt(kxd**2 + kyd**2 + kzd**2)
    inv = jnp.where(kkd > 0.0, 1.0 / jnp.where(kkd > 0.0, kkd, 1.0), 0.0)
    ex, ey, ez = kxd * inv, kyd * inv, kzd * inv
    kb = ex * gx + ey * gy + ez * gz
    return gx - ex * kb, gy - ey * kb, gz - ez * kb


@partial(jax.jit, static_argnames=())
def _vector_potential_k(gx, gy, gz, kx, ky, kz):
    """A~ = i k x g~ / k^2 (zero at k=0)."""
    k2 = kx**2 + ky**2 + kz**2
    inv = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
    ax = 1j * (ky * gz - kz * gy) * inv
    ay = 1j * (kz * gx - kx * gz) * inv
    az = 1j * (kx * gy - ky * gx) * inv
    return ax, ay, az


class ClusterField:
    """Base 3D vector field on a padded uniform grid (fields.py:77-338)."""

    _units = "dimensionless"
    _name = "vector"

    def __init__(self, left_edge, right_edge, ddims, padding=0.1,
                 vector_potential=False, divergence_clean=False,
                 dtype=jnp.float64):
        ddims = np.array(ddims).astype(int)
        left_edge = parse_value(left_edge, "kpc")
        right_edge = parse_value(right_edge, "kpc")
        width = right_edge - left_edge
        self.deltas = width / ddims
        pad_dims = (2 * np.ceil(0.5 * padding * ddims)).astype(int)
        self.left_edge = left_edge - 0.5 * pad_dims * self.deltas
        self.right_edge = right_edge + 0.5 * pad_dims * self.deltas
        self.ddims = ddims + pad_dims
        self.vector_potential = vector_potential
        self.divergence_clean = divergence_clean
        self.comps = [f"{self._name}_{ax}" for ax in "xyz"]
        self.dx, self.dy, self.dz = self.deltas
        self.dtype = dtype

    # --------------------------------------------------------- grid helpers
    def _compute_coords(self):
        """Cell-center coordinate 1D arrays (fields.py:121-129)."""
        le = self.left_edge + self.deltas * 0.5
        re = self.right_edge - self.deltas * 0.5
        xs = [np.linspace(le[i], re[i], self.ddims[i]) for i in range(3)]
        return xs

    def _compute_waves(self):
        """FFT angular wavenumbers (fields.py:131-141)."""
        nx, ny, nz = self.ddims
        kx = np.fft.fftfreq(nx, d=self.dx / (2.0 * np.pi))
        ky = np.fft.fftfreq(ny, d=self.dy / (2.0 * np.pi))
        kz = np.fft.fftfreq(nz, d=self.dz / (2.0 * np.pi))
        return (kx[:, None, None].astype(np.float64),
                ky[None, :, None].astype(np.float64),
                kz[None, None, :].astype(np.float64))

    def _divergence_clean(self, kx, ky, kz):
        """FFT -> finite-difference projection -> IFFT (fields.py:154-190)."""
        mylog.info("Perform divergence cleaning.")
        cdtype = jnp.complex128 if self.dtype == jnp.float64 else jnp.complex64
        gx = jnp.fft.fftn(jnp.asarray(self.gx, cdtype))
        gy = jnp.fft.fftn(jnp.asarray(self.gy, cdtype))
        gz = jnp.fft.fftn(jnp.asarray(self.gz, cdtype))
        # keep wavenumbers at the field's real dtype: an f64 operand would
        # promote the complex64 spectra to complex128 (unsupported on TPU)
        kxd = (jnp.sin(jnp.asarray(kx) * self.dx) / self.dx).astype(self.dtype)
        kyd = (jnp.sin(jnp.asarray(ky) * self.dy) / self.dy).astype(self.dtype)
        kzd = (jnp.sin(jnp.asarray(kz) * self.dz) / self.dz).astype(self.dtype)
        gx, gy, gz = _div_clean_k(gx, gy, gz, kxd, kyd, kzd)
        self.gx = jnp.fft.ifftn(gx).real.astype(self.dtype)
        self.gy = jnp.fft.ifftn(gy).real.astype(self.dtype)
        self.gz = jnp.fft.ifftn(gz).real.astype(self.dtype)

    def _compute_vector_potential(self, kx, ky, kz):
        """Replace g by A with curl A = g (fields.py:192-229)."""
        mylog.info("Compute vector potential.")
        cdtype = jnp.complex128 if self.dtype == jnp.float64 else jnp.complex64
        gx = jnp.fft.fftn(jnp.asarray(self.gx, cdtype))
        gy = jnp.fft.fftn(jnp.asarray(self.gy, cdtype))
        gz = jnp.fft.fftn(jnp.asarray(self.gz, cdtype))
        ax, ay, az = _vector_potential_k(
            gx, gy, gz, jnp.asarray(kx).astype(self.dtype),
            jnp.asarray(ky).astype(self.dtype),
            jnp.asarray(kz).astype(self.dtype))
        self.gx = jnp.fft.ifftn(ax).real.astype(self.dtype)
        self.gy = jnp.fft.ifftn(ay).real.astype(self.dtype)
        self.gz = jnp.fft.ifftn(az).real.astype(self.dtype)

    # ------------------------------------------------------------- mapping
    def __getitem__(self, item):
        if item == "x":
            return np.asarray(self.x)
        if item == "y":
            return np.asarray(self.y)
        if item == "z":
            return np.asarray(self.z)
        if item in self.comps:
            return np.asarray(getattr(self, f"g{item[-1]}"))
        raise KeyError(item)

    @property
    def units(self):
        if self.vector_potential:
            return f"{self._units}*kpc"
        return self._units

    def _output_value(self, field, length_unit, field_unit):
        """Convert a component to the requested output units (the natural
        storage units are kpc coordinates and ``self._units`` values;
        vector potentials carry an extra length factor)."""
        from ..core import units as U

        v = self[field]
        lfac = U.unit_factor(length_unit)  # kpc per length_unit
        if field in "xyz":
            return v / lfac, length_unit
        if field_unit is None:
            return v, self.units
        ffac = U.unit_factor(field_unit) / U.unit_factor(self._units)
        if self.vector_potential:
            return v / (ffac * lfac), f"{length_unit}*{field_unit}"
        return v / ffac, field_unit

    def write_file(self, filename, overwrite=False, length_unit=None,
                   field_unit=None, format="hdf5"):
        """Write the field + coordinates, optionally unit-converted
        (fields.py:247-306)."""
        if length_unit is None:
            length_unit = "kpc"
        if os.path.exists(filename) and not overwrite:
            raise IOError(f"Cannot create {filename}. "
                          "It exists and overwrite=False.")
        all_comps = ["x", "y", "z"] + self.comps
        if format == "hdf5":
            import h5py

            with h5py.File(filename, "w") as f:
                for field in all_comps:
                    fd, unit = self._output_value(field, length_unit,
                                                  field_unit)
                    d = f.create_dataset(field, data=fd)
                    d.attrs["units"] = unit
                f.attrs["name"] = self._name
                f.attrs["units"] = self.units
                f.attrs["vector_potential"] = int(self.vector_potential)
                f.attrs["divergence_clean"] = int(self.divergence_clean)
        elif format == "fortran":
            from scipy.io import FortranFile

            with FortranFile(filename, "w") as f:
                f.write_record(self["x"].size)
                for field in all_comps:
                    fd, _ = self._output_value(field, length_unit, field_unit)
                    f.write_record(np.asarray(fd, dtype=np.float64))
        else:
            raise ValueError(f"Unknown format {format}")

    def map_field_to_particles(self, cluster_particles, ptype="gas",
                               units=None):
        """Trilinear interpolation of the field onto particle positions
        (fields.py:308-338); fully vectorized on device.

        ``units``: optional unit string for the sampled values passed to
        ``set_field`` (the reference forwards it the same way); sampled
        values are converted from the field's native ``self.units`` into
        ``units`` first, so the container's stored value is identical
        either way and an incompatible unit string raises instead of
        being silently ignored."""
        from ..core import units as U

        pos = jnp.asarray(cluster_particles[ptype, "particle_position"])
        vals = _trilinear(jnp.asarray(self.x), jnp.asarray(self.y),
                          jnp.asarray(self.z),
                          jnp.stack([jnp.asarray(self.gx),
                                     jnp.asarray(self.gy),
                                     jnp.asarray(self.gz)]), pos)
        out = np.asarray(vals.T)
        if units is None:
            cluster_particles.set_field(ptype, self._name, out)
        else:
            # dimension-checked: converting gauss to kpc/Myr (or a
            # vector potential's gauss*kpc to uG) raises instead of
            # silently relabelling the values
            factor = U.conversion_factor(self.units, units)
            cluster_particles.set_field(ptype, self._name, out * factor,
                                        units=units)


@partial(jax.jit, static_argnames=())
def _trilinear(x, y, z, g, pos):
    """Trilinear sample of (3, nx, ny, nz) field at (N, 3) points.

    Points outside the grid get 0 (RegularGridInterpolator fill_value=0.0).
    The grid coordinates are the generator's cell centers and therefore
    UNIFORM, so the cell index is computed, not searched; the three field
    components are packed on the trailing axis so each of the 8 corner
    fetches is ONE row-of-3 gather instead of a (3, N) 2D gather (the
    row-gather rules measured in scripts/tpu_gather_experiments2.py).
    """

    def axis_locate(coords, p):
        n = coords.shape[0]
        d = (coords[-1] - coords[0]) / (n - 1)
        t = jnp.clip((p - coords[0]) / d, 0.0, n - 1 - 1e-9)
        i = jnp.minimum(t.astype(jnp.int32), n - 2)
        w = jnp.clip(t - i.astype(p.dtype), 0.0, 1.0)
        inside = (p >= coords[0]) & (p <= coords[-1])
        return i, w, inside

    ix, wx, inx = axis_locate(x, pos[:, 0])
    iy, wy, iny = axis_locate(y, pos[:, 1])
    iz, wz, inz = axis_locate(z, pos[:, 2])
    inside = (inx & iny & inz).astype(g.dtype)

    ny, nz = g.shape[2], g.shape[3]
    gf = jnp.moveaxis(g, 0, -1).reshape(-1, g.shape[0])  # (nx*ny*nz, 3)
    base = (ix * ny + iy) * nz + iz

    out = 0.0
    for dx_, wx_ in ((0, 1.0 - wx), (1, wx)):
        for dy_, wy_ in ((0, 1.0 - wy), (1, wy)):
            for dz_, wz_ in ((0, 1.0 - wz), (1, wz)):
                flat = base + (dx_ * ny + dy_) * nz + dz_
                out = out + (wx_ * wy_ * wz_)[:, None] * gf[flat]
    return (out * inside[:, None]).T


class GaussianRandomField(ClusterField):
    """Kolmogorov-spectrum Gaussian random vector field
    (fields.py:341-573)."""

    def __init__(self, left_edge, right_edge, ddims, l_min, l_max,
                 padding=0.1, alpha=-11.0 / 3.0, g_rms=1.0, ctr1=None,
                 ctr2=None, ctr3=None, r1=None, r2=None, r3=None, g1=None,
                 g2=None, g3=None, vector_potential=False,
                 divergence_clean=False, prng=None, r_max=None,
                 dtype=jnp.float64, use_rfft=None):
        key = parse_prng(prng)
        super().__init__(left_edge, right_edge, ddims, padding=padding,
                         vector_potential=vector_potential,
                         divergence_clean=divergence_clean, dtype=dtype)

        nx, ny, nz = self.ddims
        # halo slots bind by POSITION — validate each slot whole, so a
        # partially-given slot raises instead of silently dropping a
        # halo (counting r's alone made ctr3+g3-without-r3 vanish) or
        # crashing in np.asarray(None)
        ctrs, rs, gs = [], [], []
        for ctr, r, g, tag in ((ctr1, r1, g1, "1"), (ctr2, r2, g2, "2"),
                               (ctr3, r3, g3, "3")):
            if ctr is None and r is None and g is None:
                continue
            if r is None or g is None:
                raise ValueError(
                    f"halo {tag} is partially specified (r{tag}="
                    f"{'set' if r is not None else None}, g{tag}="
                    f"{'set' if g is not None else None}): each halo "
                    f"needs both r{tag} and g{tag}")
            if ctr is None:
                if tag != "1":
                    raise RuntimeError(
                        f"Need to specify 'ctr{tag}' for halo {tag}!")
                ctr = 0.5 * (self.left_edge + self.right_edge)
            ctrs.append(parse_value(ctr, "kpc"))
            rs.append(parse_value(r, "kpc"))
            gs.append(parse_value(g, self._units))
        num_halos = len(ctrs)

        k0 = 2.0 * np.pi / float(parse_value(l_min, "kpc"))
        k1 = 2.0 * np.pi / float(parse_value(l_max, "kpc"))

        mylog.info("Setting up the Gaussian random fields.")
        kx, ky, kz = self._compute_waves()

        xs = self._compute_coords()
        self.x = xs[0]
        self.y = xs[1]
        self.z = xs[2]

        if num_halos == 0:
            # constant rms: shaping, normalization, projection and vector
            # potential never need a real-space intermediate — one k-space
            # pass, 6 FFTs instead of 12 (18 with vector potential)
            mylog.info("Scaling the fields by the constant value %s.",
                       float(parse_value(g_rms, self._units)))
            kxd = np.sin(kx * self.dx) / self.dx
            kyd = np.sin(ky * self.dy) / self.dy
            kzd = np.sin(kz * self.dz) / self.dz
            if use_rfft is None:
                # auto: the staged half-spectrum route measured 0.602 s
                # vs 0.676 s fused-c64 at 512^3 f32 on one v5e (r4
                # batch 1); f64 needs c128 FFTs the TPU lacks, so the
                # fused route keeps the f64/CPU path
                use_rfft = self.dtype != jnp.float64
            elif use_rfft and self.dtype == jnp.float64:
                mylog.warning(
                    "use_rfft=True ignored for float64 fields (the "
                    "half-spectrum route needs complex128 FFTs the TPU "
                    "lacks); using the fused complex transform")
                use_rfft = False
            core = (_grf_core_rfft_staged if use_rfft
                    else _grf_core_fused)
            self.gx, self.gy, self.gz = core(
                key, (nx, ny, nz), jnp.asarray(kx), jnp.asarray(ky),
                jnp.asarray(kz), jnp.asarray(kxd, self.dtype),
                jnp.asarray(kyd, self.dtype), jnp.asarray(kzd, self.dtype),
                k0, k1, alpha, float(parse_value(g_rms, self._units)),
                self.divergence_clean, self.vector_potential, self.dtype)
            mylog.info("Field generation complete.")
            return

        gx, gy, gz = _grf_core(key, (nx, ny, nz), jnp.asarray(kx),
                               jnp.asarray(ky), jnp.asarray(kz), k0, k1,
                               alpha, self.dtype)
        self.gx, self.gy, self.gz = gx, gy, gz

        X = jnp.asarray(xs[0])[:, None, None]
        Y = jnp.asarray(xs[1])[None, :, None]
        Z = jnp.asarray(xs[2])[None, None, :]
        g2sum = jnp.zeros((nx, ny, nz), self.dtype)
        for ctr, rprof, gprof in zip(ctrs, rs, gs):
            mylog.info("Scaling the fields by a cluster profile.")
            rr = jnp.sqrt((X - ctr[0]) ** 2 + (Y - ctr[1]) ** 2
                          + (Z - ctr[2]) ** 2)
            if r_max is not None:
                rr = jnp.minimum(rr, parse_value(r_max, "kpc"))
            gval = jnp.interp(rr, jnp.asarray(rprof), jnp.asarray(gprof))
            g2sum = g2sum + gval.astype(self.dtype) ** 2
        scale = jnp.sqrt(g2sum)

        self.gx = self.gx * scale
        self.gy = self.gy * scale
        self.gz = self.gz * scale

        if self.divergence_clean:
            # preserve the rms amplitude through the projection
            # (the reference rescales by the power ratio, fields.py:561-568;
            # we use the sqrt so that <g^2> is exactly preserved)
            power = (jnp.sum(self.gx**2) + jnp.sum(self.gy**2)
                     + jnp.sum(self.gz**2))
            self._divergence_clean(kx, ky, kz)
            power2 = (jnp.sum(self.gx**2) + jnp.sum(self.gy**2)
                      + jnp.sum(self.gz**2))
            rescale = jnp.sqrt(power / power2)
            self.gx = self.gx * rescale
            self.gy = self.gy * rescale
            self.gz = self.gz * rescale

        if self.vector_potential:
            self._compute_vector_potential(kx, ky, kz)

        mylog.info("Field generation complete.")


def _spectrum_sigma(kk, k0, k1, alpha, dtype):
    """THE spectrum shaping used by every GRF path (plain, fused,
    staged-rfft cores here and the sharded generator in
    parallel/fields.py): Kolmogorov-like power-law with an outer-scale
    cutoff, zero mode carries no power.  One definition so a spectrum
    tweak cannot silently diverge the paths."""
    sigma = (1.0 + (kk / k1) ** 2) ** (0.25 * alpha) * jnp.exp(
        -0.5 * (kk / k0) ** 2)
    return sigma.at[(0,) * sigma.ndim].set(0.0).astype(dtype)


@partial(jax.jit, static_argnames=("shape", "dtype"))
def _grf_core(key, shape, kx, ky, kz, k0, k1, alpha, dtype):
    """White noise -> spectrum-shaped unit-rms Gaussian random field."""
    nx, ny, nz = shape
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    noise = jax.random.normal(key, (3, nx, ny, nz), dtype=dtype)
    kk = jnp.sqrt(kx**2 + ky**2 + kz**2)
    sigma = _spectrum_sigma(kk, k0, k1, alpha, dtype)

    def shape_one(w):
        W = jnp.fft.fftn(w.astype(cdtype))
        return jnp.fft.ifftn(sigma * W).real.astype(dtype)

    gx = shape_one(noise[0])
    gy = shape_one(noise[1])
    gz = shape_one(noise[2])
    g_avg = jnp.sqrt(jnp.mean(gx**2 + gy**2 + gz**2))
    return gx / g_avg, gy / g_avg, gz / g_avg


@partial(jax.jit,
         static_argnames=("shape", "dtype", "div_clean", "vec_pot"))
def _grf_core_fused(key, shape, kx, ky, kz, kxd, kyd, kzd, k0, k1, alpha,
                    g_rms, div_clean, vec_pot, dtype):
    """Constant-rms GRF with spectrum shaping, rms normalization,
    divergence projection and (optionally) the vector potential all in ONE
    k-space pass: 3 forward + 3 inverse FFTs, where the staged path
    (shape -> ifft -> scale -> fft -> project -> ifft) costs 12.

    The rms normalization and the projection's power-preserving rescale
    are computed from the spectra by Parseval
    (sum_x |g|^2 = sum_k |g~|^2 / N) — identical values to the
    real-space sums of the staged path up to reduction roundoff.
    """
    nx, ny, nz = shape
    n_cells = nx * ny * nz
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    noise = jax.random.normal(key, (3, nx, ny, nz), dtype=dtype)
    kk = jnp.sqrt(kx**2 + ky**2 + kz**2)
    sigma = _spectrum_sigma(kk, k0, k1, alpha, dtype)

    W = [jnp.fft.fftn(noise[i].astype(cdtype)) * sigma for i in range(3)]

    def power(S):
        return sum(jnp.sum(jnp.abs(s) ** 2) for s in S)

    # rms normalization: mean_x(sum_c g_c^2) = sum_{c,k} |W_c|^2 / N^2
    g_avg = jnp.sqrt(power(W) / (n_cells * n_cells))
    scale = (g_rms / g_avg).astype(dtype)
    W = [w * scale for w in W]

    if div_clean:
        p0 = power(W)
        W = list(_div_clean_k(*W, kxd, kyd, kzd))
        W = [w * jnp.sqrt(p0 / power(W)).astype(dtype) for w in W]
    if vec_pot:
        W = list(_vector_potential_k(*W, kx.astype(dtype),
                                     ky.astype(dtype), kz.astype(dtype)))
    return tuple(jnp.fft.ifftn(w).real.astype(dtype) for w in W)


@partial(jax.jit, static_argnames=("shape",))
def _rfft_shape_one(w, sigma_h, shape):
    """One component: real white noise -> shaped HALF-spectrum (rfft).

    ``lax.fft`` with an explicit FftType avoids jnp.fft's x64 promotion
    of float32 -> complex128 (TPU has no c128 FFT)."""
    Wk = jax.lax.fft(w, jax.lax.FftType.RFFT, shape)
    return Wk * sigma_h


@partial(jax.jit, static_argnames=("shape", "div_clean", "vec_pot"))
def _rfft_kmath(Wx, Wy, Wz, wz, kxd, kyd, kzd_h, kx, ky, kz_h, g_rms,
                shape, div_clean, vec_pot):
    """All half-spectrum k-space math in one (FFT-free) program:
    Parseval rms normalization, divergence projection with its
    power-preserving rescale, optional vector potential.

    ``wz``: (nzh,) Parseval plane weights — 2 for interior kz planes whose
    conjugate mirror the half-spectrum drops, 1 for the self-conjugate
    kz=0 (and kz=n/2 when n is even) planes."""
    nx, ny, nz = shape
    n_cells = nx * ny * nz

    def power(S):
        return sum(jnp.sum(wz * jnp.abs(s) ** 2) for s in S)

    W = [Wx, Wy, Wz]
    g_avg = jnp.sqrt(power(W) / (n_cells * float(n_cells)))
    scale = (g_rms / g_avg).astype(Wx.real.dtype)
    W = [w * scale for w in W]
    if div_clean:
        p0 = power(W)
        W = list(_div_clean_k(*W, kxd, kyd, kzd_h))
        W = [w * jnp.sqrt(p0 / power(W)).astype(Wx.real.dtype) for w in W]
    if vec_pot:
        W = list(_vector_potential_k(*W, kx, ky, kz_h))
    return tuple(W)


@partial(jax.jit, static_argnames=("shape",))
def _irfft_one(Wk, shape):
    return jax.lax.fft(Wk, jax.lax.FftType.IRFFT, shape)


def _grf_core_rfft_staged(key, shape, kx, ky, kz, kxd, kyd, kzd, k0, k1,
                          alpha, g_rms, div_clean, vec_pot, dtype):
    """The fused constant-rms GRF on rfft HALF-spectra, as STAGED programs.

    Mathematically identical to :func:`_grf_core_fused` (the imaginary
    half of a real field's spectrum is redundant), but each FFT moves/
    computes half the data: a 512^3 rfft measures 99/95 ms fwd/inv vs
    128 ms for the c64 fftn on v5e (docs/performance.md S4).  The FULLY
    fused 6-rfft program crashes the remote TPU compiler (round-3
    negative result), so this variant deliberately splits the work into
    3 forward + 1 k-math + 3 inverse programs — the dispatches pipeline
    asynchronously, so the seams cost latency only, not wall-time.
    Float32 path only (f64 stays on the fused c128 route, CPU-tested).
    """
    nx, ny, nz = (int(s) for s in shape)
    nzh = nz // 2 + 1
    kz_h, kzd_h = kz[..., :nzh], kzd[..., :nzh]
    kk = jnp.sqrt(kx**2 + ky**2 + kz_h**2)
    sigma = _spectrum_sigma(kk, k0, k1, alpha, dtype)
    wz = np.full(nzh, 2.0, dtype=np.float32)
    wz[0] = 1.0
    if nz % 2 == 0:
        wz[-1] = 1.0
    wz = jnp.asarray(wz)

    # the SAME single-key (3, nx, ny, nz) draw as _grf_core_fused, so the
    # two routes produce identical fields for identical keys (pinned by
    # tests/test_fields.py)
    noise = jax.random.normal(key, (3, nx, ny, nz), dtype=dtype)
    W = [_rfft_shape_one(noise[i], sigma, (nx, ny, nz)) for i in range(3)]
    W = _rfft_kmath(W[0], W[1], W[2], wz, kxd, kyd, kzd_h,
                    kx.astype(dtype), ky.astype(dtype),
                    kz_h.astype(dtype), g_rms, (nx, ny, nz), div_clean,
                    vec_pot)
    return tuple(_irfft_one(w, (nx, ny, nz)) for w in W)


def _load_radial_profile(profile, field_name):
    """(r, g) arrays from a ClusterModel, an HDF5 path, or an (r, g) tuple
    (fields.py:631-690 pattern)."""
    from ..model import ClusterModel

    if isinstance(profile, ClusterModel):
        return np.asarray(profile["radius"]), np.asarray(profile[field_name])
    if isinstance(profile, (str, os.PathLike)):
        import h5py

        with h5py.File(profile, "r") as f:
            r = np.asarray(f["fields"]["radius"][()])
            g = np.asarray(f["fields"][field_name][()])
        return r, g
    r, g = profile
    return np.asarray(r), np.asarray(g)


class RandomMagneticField(GaussianRandomField):
    """Constant-rms magnetic field (fields.py:576-605); gauss, div-cleaned."""

    _units = "gauss"
    _name = "magnetic_field"
    _vector_potential = False

    def __init__(self, left_edge, right_edge, ddims, l_min, l_max, B_rms,
                 padding=0.1, alpha=-11.0 / 3.0, prng=None, dtype=jnp.float64,
                 use_rfft=None):
        super().__init__(left_edge, right_edge, ddims, l_min, l_max,
                         padding=padding, alpha=alpha, divergence_clean=True,
                         g_rms=B_rms, vector_potential=self._vector_potential,
                         prng=prng, dtype=dtype, use_rfft=use_rfft)


class RadialRandomMagneticField(GaussianRandomField):
    """Magnetic field scaled by up to three radial B(r) profiles
    (fields.py:608-712)."""

    _units = "gauss"
    _name = "magnetic_field"
    _vector_potential = False
    _profile_field = "magnetic_field_strength"

    def __init__(self, left_edge, right_edge, ddims, l_min, l_max, ctr1,
                 profile1, padding=0.1, ctr2=None, profile2=None, ctr3=None,
                 profile3=None, alpha=-11.0 / 3.0, r_max=None, prng=None,
                 divergence_clean=True, dtype=jnp.float64):
        r1, g1 = _load_radial_profile(profile1, self._profile_field)
        r2 = g2 = r3 = g3 = None
        if profile2 is not None:
            r2, g2 = _load_radial_profile(profile2, self._profile_field)
        if profile3 is not None:
            r3, g3 = _load_radial_profile(profile3, self._profile_field)
        super().__init__(left_edge, right_edge, ddims, l_min, l_max,
                         padding=padding, alpha=alpha, ctr1=ctr1, ctr2=ctr2,
                         ctr3=ctr3, r1=r1, r2=r2, r3=r3, g1=g1, g2=g2, g3=g3,
                         divergence_clean=divergence_clean, r_max=r_max,
                         vector_potential=self._vector_potential, prng=prng,
                         dtype=dtype)


class RandomMagneticVectorPotential(RandomMagneticField):
    """(fields.py:715-717)."""

    _name = "magnetic_vector_potential"
    _vector_potential = True


class RadialRandomMagneticVectorPotential(RadialRandomMagneticField):
    """(fields.py:720-722)."""

    _name = "magnetic_vector_potential"
    _vector_potential = True


class RandomVelocityField(GaussianRandomField):
    """Constant-rms turbulent velocity field (fields.py:725-753)."""

    _units = "kpc/Myr"
    _name = "velocity"

    def __init__(self, left_edge, right_edge, ddims, l_min, l_max, V_rms,
                 padding=0.1, alpha=-11.0 / 3.0, divergence_clean=False,
                 prng=None, dtype=jnp.float64):
        super().__init__(left_edge, right_edge, ddims, l_min, l_max,
                         padding=padding, g_rms=V_rms, alpha=alpha, prng=prng,
                         divergence_clean=divergence_clean, dtype=dtype)


class RadialRandomVelocityField(RadialRandomMagneticField):
    """Velocity field scaled by sigma_v(r) profiles (fields.py:756-848)."""

    _units = "kpc/Myr"
    _name = "velocity"
    _vector_potential = False
    _profile_field = "velocity_dispersion"

    def __init__(self, left_edge, right_edge, ddims, l_min, l_max, ctr1,
                 profile1, padding=0.1, ctr2=None, profile2=None, ctr3=None,
                 profile3=None, alpha=-11.0 / 3.0, r_max=None,
                 divergence_clean=False, prng=None, dtype=jnp.float64):
        super().__init__(left_edge, right_edge, ddims, l_min, l_max, ctr1,
                         profile1, padding=padding, ctr2=ctr2,
                         profile2=profile2, ctr3=ctr3, profile3=profile3,
                         alpha=alpha, r_max=r_max, prng=prng,
                         divergence_clean=divergence_clean, dtype=dtype)
