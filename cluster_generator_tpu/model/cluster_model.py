"""The :class:`ClusterModel` container — the user-facing equilibrium model.

Mirrors the API surface of the reference ``cluster_generator/model.py`` class
(model.py:50-1201) on top of the jitted builders in
:mod:`cluster_generator_tpu.model.builders`.  Fields are plain float64 numpy
arrays in galactic units (keV for temperature, gauss for B); unit strings
live in :data:`cluster_generator_tpu.core.units.FIELD_UNITS` and are only
applied at the I/O boundary.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from ..core import constants as C
from ..core import units
from ..core.grid import numpy_log_radius_grid
from ..core.interp import cubic_spline, spline_eval
from ..core.logging import mylog
from .builders import (
    build_from_dens_and_tden,
    build_from_dens_and_temp,
    build_no_gas,
)

__all__ = ["ClusterModel", "HydrostaticEquilibrium"]


def _to_numpy_fields(fields: dict) -> "OrderedDict[str, np.ndarray]":
    out = OrderedDict()
    for k, v in fields.items():
        out[k] = np.asarray(v, dtype=np.float64)
    return out


class ClusterModel:
    """A single galaxy-cluster equilibrium model on a log-radius grid."""

    default_fields = [
        "density", "temperature", "pressure", "total_density",
        "gravitational_potential", "gravitational_field", "total_mass",
        "gas_mass", "dark_matter_mass", "dark_matter_density",
        "stellar_density", "stellar_mass",
    ]

    _keep_units = ["entropy", "electron_number_density",
                   "magnetic_field_strength"]

    def __init__(self, num_elements: int, fields: dict,
                 gravity: str = "newtonian"):
        self.num_elements = int(num_elements)
        self.fields = _to_numpy_fields(fields)
        # which gravity law produced these fields (models.rst:75-123);
        # informational — the fields already encode it
        self.gravity = gravity
        self._dm_virial = None
        self._star_virial = None

    def __repr__(self):
        rr = self.fields.get("radius")
        span = (f"[{rr[0]:.3g}, {rr[-1]:.3g}] kpc"
                if rr is not None and len(rr) else "?")
        return (f"<ClusterModel: {self.num_elements} pts {span}, "
                f"{len(self.fields)} fields>")

    __str__ = __repr__

    # ------------------------------------------------------------ dict API
    def __getitem__(self, key):
        return self.fields[key]

    def __contains__(self, key):
        return key in self.fields

    def keys(self):
        return self.fields.keys()

    # ------------------------------------------------------- lazy virials
    @property
    def dm_virial(self):
        from ..virial import VirialEquilibrium

        if self._dm_virial is None:
            self._dm_virial = VirialEquilibrium(self, "dark_matter")
        return self._dm_virial

    @property
    def star_virial(self):
        from ..virial import VirialEquilibrium

        if self._star_virial is None and "stellar_density" in self:
            self._star_virial = VirialEquilibrium(self, "stellar")
        return self._star_virial

    # --------------------------------------------------------- constructors
    @classmethod
    def from_arrays(cls, fields) -> "ClusterModel":
        """Build from a raw field dict; 'radius' required (model.py:129-146)."""
        return cls(np.asarray(fields["radius"]).size, fields)

    @classmethod
    def from_dens_and_tden(cls, rmin, rmax, density, total_density,
                           stellar_density=None, num_points=1000,
                           gravity="newtonian", gravity_params=None):
        """HSE model from gas and total density profiles (model.py:565-618).

        ``gravity``: a registered law name ("newtonian", "aqual",
        "qumond", "emond"); the matter mass from ``total_density`` maps
        to the field via the law (models.rst:75-123)."""
        mylog.info("Computing the profiles from density and total density.")
        rr = jnp.asarray(numpy_log_radius_grid(rmin, rmax, num_points))
        fields = build_from_dens_and_tden(rr, density, total_density,
                                          stellar_density, gravity=gravity,
                                          gravity_params=gravity_params)
        return cls(num_points, fields, gravity=gravity)

    @classmethod
    def from_dens_and_temp(cls, rmin, rmax, density, temperature,
                           stellar_density=None, num_points=1000,
                           gravity="newtonian", gravity_params=None):
        """HSE model from gas density and temperature (model.py:474-523).

        ``gravity``: a registered law name; the HSE field inverts to the
        law's *dynamical* (matter) mass (models.rst:75-123)."""
        mylog.info("Computing the profiles from density and temperature.")
        rr = jnp.asarray(numpy_log_radius_grid(rmin, rmax, num_points))
        fields = build_from_dens_and_temp(rr, density, temperature,
                                          stellar_density, gravity=gravity,
                                          gravity_params=gravity_params)
        return cls(num_points, fields, gravity=gravity)

    @classmethod
    def from_dens_and_entr(cls, rmin, rmax, density, entropy,
                           stellar_density=None, num_points=1000,
                           gravity="newtonian", gravity_params=None):
        """HSE model from gas density and entropy (model.py:525-563).

        T = S * n_e^{2/3} with n_e = rho / (mu_e m_p) in cm^-3.
        """
        n_e = units.density_to_ne(density)
        temperature = entropy * n_e ** (2.0 / 3.0)
        return cls.from_dens_and_temp(rmin, rmax, density, temperature,
                                      stellar_density=stellar_density,
                                      num_points=num_points, gravity=gravity,
                                      gravity_params=gravity_params)

    @classmethod
    def no_gas(cls, rmin, rmax, total_density, stellar_density=None,
               num_points=1000, gravity="newtonian", gravity_params=None):
        """Model without a gas component (model.py:620-656)."""
        rr = jnp.asarray(numpy_log_radius_grid(rmin, rmax, num_points))
        fields = build_no_gas(rr, total_density, stellar_density,
                              gravity=gravity, gravity_params=gravity_params)
        return cls(num_points, fields, gravity=gravity)

    # ----------------------------------------------------------------- I/O
    @classmethod
    def from_h5_file(cls, filename, r_min=None, r_max=None) -> "ClusterModel":
        """Read a model from HDF5 (model.py:148-211).

        The on-disk schema matches the reference: per-field datasets under
        the ``fields/`` group with a ``units`` attribute, plus optional
        ``dm_df``/``star_df`` datasets carrying the distribution functions
        so Eddington inversion is resumed, not recomputed.
        """
        import h5py

        from ..virial import VirialEquilibrium

        fields = OrderedDict()
        with h5py.File(filename, "r") as f:
            fnames = list(f["fields"].keys())
            in_cgs = f.attrs.get("unit_system", "galactic") == "cgs"
            gravity = str(f.attrs.get("gravity", "newtonian"))
            for field in fnames:
                ds = f["fields"][field]
                arr = np.asarray(ds[()], dtype=np.float64)
                if field not in cls._keep_units and in_cgs:
                    arr = arr / units.galactic_to_cgs_factor(field)
                fields[field] = arr
            dm_df = np.asarray(f["dm_df"][()]) if "dm_df" in f else None
            star_df = np.asarray(f["star_df"][()]) if "star_df" in f else None

        if r_min is None:
            r_min = 0.0
        if r_max is None:
            r_max = fields["radius"][-1] * 2
        mask = (fields["radius"] >= r_min) & (fields["radius"] <= r_max)
        for field in fnames:
            fields[field] = fields[field][mask]
        model = cls(int(mask.sum()), fields, gravity=gravity)
        if dm_df is not None:
            model._dm_virial = VirialEquilibrium(model, ptype="dark_matter",
                                                 df=dm_df[mask])
        if star_df is not None:
            model._star_virial = VirialEquilibrium(model, ptype="stellar",
                                                   df=star_df[mask])
        return model

    def _masked_fields(self, r_min, r_max):
        if r_min is None:
            r_min = 0.0
        if r_max is None:
            r_max = self.fields["radius"][-1] * 2
        mask = ((self.fields["radius"] >= r_min)
                & (self.fields["radius"] <= r_max))
        return mask

    def _field_for_output(self, k, v, in_cgs):
        if in_cgs:
            if k == "temperature":
                return units.keV_to_K(v), "K"
            if k not in self._keep_units:
                return v * units.galactic_to_cgs_factor(k), units.CGS_UNITS.get(k, "")
        return v, units.FIELD_UNITS.get(k, "")

    def write_model_to_h5(self, output_filename, in_cgs=False, r_min=None,
                          r_max=None, overwrite=False):
        """Write the model to HDF5 (model.py:342-397 schema)."""
        import h5py

        if os.path.exists(output_filename) and not overwrite:
            raise IOError(f"Cannot create {output_filename}. "
                          "It exists and overwrite=False.")
        mask = self._masked_fields(r_min, r_max)
        with h5py.File(output_filename, "w") as f:
            f.create_dataset("num_elements", data=int(mask.sum()))
            f.attrs["unit_system"] = "cgs" if in_cgs else "galactic"
            f.attrs["gravity"] = self.gravity
            g = f.create_group("fields")
            for k, v in self.fields.items():
                fd, unit = self._field_for_output(k, v[mask], in_cgs)
                ds = g.create_dataset(k, data=fd)
                ds.attrs["units"] = unit
            # the reference writes the DFs unmasked even when r_min/r_max
            # mask the fields (model.py:392-397) — masked here so the
            # roundtrip stays self-consistent
            if self._dm_virial is not None:
                ds = f.create_dataset("dm_df", data=self.dm_virial.df[mask])
                ds.attrs["units"] = "Msun*Myr**3/kpc**6"
            if self._star_virial is not None:
                ds = f.create_dataset("star_df",
                                      data=self.star_virial.df[mask])
                ds.attrs["units"] = "Msun*Myr**3/kpc**6"

    # astropy-parseable unit labels for the ECSV header (our internal
    # strings are already astropy 'generic'-format compatible except these)
    _ECSV_UNIT_MAP = {"dimensionless": "", "gauss": "G"}

    def write_model_to_ascii(self, output_filename, in_cgs=False,
                             overwrite=False):
        """Write the model as an ECSV table — the format astropy QTable
        emits, so reference-side tooling (model.py:307-340 writes via
        QTable) can ``QTable.read`` repo models with units intact.

        The ECSV v1.0 header is a YAML block in ``#``-comments followed by
        space-delimited columns; no astropy dependency is needed to WRITE
        it (the round-trip test parses it with PyYAML, and with real
        astropy when available)."""
        if os.path.exists(output_filename) and not overwrite:
            raise IOError(f"Cannot create {output_filename}. "
                          "It exists and overwrite=False.")
        names, cols, units_ = [], [], []
        for k, v in self.fields.items():
            fd, unit = self._field_for_output(k, v, in_cgs)
            names.append(k)
            units_.append(self._ECSV_UNIT_MAP.get(unit, unit))
            cols.append(np.asarray(fd))
        lines = ["# %ECSV 1.0", "# ---", "# datatype:"]
        for name, unit in zip(names, units_):
            entry = f"# - {{name: {name}"
            if unit:
                entry += f", unit: {unit}"
            entry += ", datatype: float64}"
            lines.append(entry)
        lines.append("# meta: {comments: [unit_system="
                     f"{'cgs' if in_cgs else 'galactic'}]}}")
        lines.append("# schema: astropy-2.0")
        lines.append(" ".join(names))
        data = np.column_stack(cols)
        with open(output_filename, "w") as f:
            f.write("\n".join(lines) + "\n")
            np.savetxt(f, data, fmt="%.18e", delimiter=" ")

    def write_model_to_binary(self, output_filename, fields_to_write=None,
                              in_cgs=False, r_min=None, r_max=None,
                              overwrite=False):
        """Fortran-unformatted record writer (model.py:399-456; RAMSES path)."""
        from scipy.io import FortranFile

        if fields_to_write is None:
            fields_to_write = list(self.fields.keys())
        if os.path.exists(output_filename) and not overwrite:
            raise IOError(f"Cannot create {output_filename}. "
                          "It exists and overwrite=False.")
        mask = self._masked_fields(r_min, r_max)
        with FortranFile(output_filename, "w") as f:
            f.write_record(int(mask.sum()))
            prof_rec = []
            for k in fields_to_write:
                fd, _ = self._field_for_output(k, self.fields[k][mask], in_cgs)
                prof_rec.append(np.asarray(fd))
            f.write_record(np.array(prof_rec).T)

    # -------------------------------------------------------------- fields
    def set_field(self, name: str, value, unit: str | None = None):
        """Set a field (size-checked), converting from ``unit`` into the
        field's NATIVE storage unit with a dimension check — a unit of the
        wrong dimension (e.g. Kelvin for the keV-native temperature) raises
        instead of silently mis-scaling (model.py:458-472; upstream's unyt
        refuses such conversions too)."""
        value = np.asarray(value, dtype=np.float64)
        if unit is not None:
            value = units.to_field_units(value, unit, name)
        if value.size != self.num_elements:
            raise ValueError(f"The length of the array needs to be "
                             f"{self.num_elements} elements!")
        if name in self.fields:
            mylog.warning("Overwriting field %s.", name)
        self.fields[name] = value

    def set_rmax(self, r_max) -> "ClusterModel":
        """Truncate the model at r_max (model.py:271-293; the reference
        version passes invalid kwargs to ``__init__`` — fixed here)."""
        mask = self.fields["radius"] <= r_max
        fields = OrderedDict((k, v[mask]) for k, v in self.fields.items())
        model = ClusterModel(int(mask.sum()), fields)
        return model

    def find_field_at_radius(self, field, r):
        """Interpolate ``field`` at radius ``r`` (model.py:658-665)."""
        return np.interp(r, self["radius"], self[field])

    def mass_in_radius(self, radius):
        """Masses of each component within ``radius`` (model.py:1088-1107).

        A ``radius`` below the first grid point returns zeros for every
        component (the reference raises a bare IndexError there,
        model.py:1088-1107 — an inherited edge-case bug fixed here)."""
        masses = {}
        r = self.fields["radius"]
        inside = r < radius
        for mtype in ["total", "gas", "dark_matter", "stellar"]:
            if f"{mtype}_mass" in self.fields:
                m = self.fields[f"{mtype}_mass"]
                masses[mtype] = m[inside][-1] if inside.any() else 0.0 * m[0]
        return masses

    def find_radius_for_density(self, density):
        """Radius where the gas density falls to ``density``
        (model.py:1109-1113).

        The interpolation requires a monotonically decreasing density
        profile (the reference silently returns garbage otherwise); a
        non-monotone profile raises ValueError here."""
        r = self.fields["radius"][::-1]
        d = self.fields["density"][::-1]
        # tolerance-based guard: float-noise wiggles (|step| within
        # ~1e-12 of the local magnitude) must not reject an otherwise
        # decreasing profile loaded from arrays or HDF5
        if np.any(np.diff(d) < -1e-12 * np.abs(d[:-1])):
            raise ValueError(
                "find_radius_for_density requires a monotonically "
                "decreasing density profile; this model's gas density "
                "is non-monotone in radius.")
        return float(np.interp(density, np.maximum.accumulate(d), r))

    # ------------------------------------------------------------- checks
    def check_hse(self):
        """Relative deviation from hydrostatic equilibrium
        (model.py:667-690)."""
        if "pressure" not in self.fields:
            raise RuntimeError("This ClusterModel contains no gas!")
        rr = jnp.asarray(self.fields["radius"])
        p_sp = cubic_spline(rr, jnp.asarray(self.fields["pressure"]))
        dPdx = spline_eval(p_sp, rr, nu=1)
        rhog = (jnp.asarray(self.fields["density"])
                * jnp.asarray(self.fields["gravitational_field"]))
        chk = np.asarray((dPdx - rhog) / rhog)
        mylog.info("The maximum relative deviation of this profile from "
                   "hydrostatic equilibrium is %g", np.abs(chk).max())
        return chk

    def check_dm_virial(self):
        return self.dm_virial.check_virial()

    def check_star_virial(self):
        return self.star_virial.check_virial()

    def compute_velocity_dispersion(self, ptype: str = "dark_matter",
                                    r_a=None):
        """Jeans radial velocity dispersion, stored as the
        ``velocity_dispersion`` field.

        Isotropic (``r_a=None``):
        sigma_r^2(r) = (1 / rho(r)) int_r^{rmax} rho(r') g(r') dr'
        with g = -dPhi/dr < 0 taken from the model's gravitational field.

        Osipkov-Merritt (``r_a`` in kpc — the analytic companion of
        ``VirialEquilibrium(..., r_a=...)`` draws): the Jeans equation
        with beta(r) = r^2/(r^2 + r_a^2) integrates in closed form to
        sigma_r^2(r) = int_r^{rmax} (1 + r'^2/r_a^2) rho g dr' /
        (rho (1 + r^2/r_a^2)).

        This supplies the sigma_v(r) profile that
        :class:`~cluster_generator_tpu.fields.RadialRandomVelocityField`
        scales by (the reference expects the field to pre-exist,
        fields.py:779-790; here it is derivable from any model).
        """
        from ..core.quadrature import integrate_from

        if r_a is not None and not float(r_a) > 0.0:
            # same validation as VirialEquilibrium(r_a=...): r_a <= 0
            # would silently poison the field (r/0 -> inf, inf/inf NaN)
            raise ValueError(f"r_a must be positive (got {r_a!r}); use "
                             "r_a=None for the isotropic dispersion")
        rr = jnp.asarray(self.fields["radius"])
        rho = jnp.asarray(self.fields[f"{ptype}_density"]
                          if ptype != "gas" else self.fields["density"])
        g = jnp.asarray(self.fields["gravitational_field"])
        aug_fn = ((lambda r: 1.0) if r_a is None
                  else (lambda r: 1.0 + (r / float(r_a)) ** 2))
        rho_sp = cubic_spline(rr, rho)
        g_sp = cubic_spline(rr, g)
        integrand = lambda r: (aug_fn(r) * spline_eval(rho_sp, r)
                               * (-spline_eval(g_sp, r)))
        num = integrate_from(integrand, rr)
        sigma2 = (np.asarray(num)
                  / np.maximum(np.asarray(rho * aug_fn(rr)), 1e-300))
        sigma = np.sqrt(np.maximum(sigma2, 0.0))
        # the outermost point has an empty integral; extend smoothly
        sigma[-1] = sigma[-2]
        self.set_field("velocity_dispersion", sigma)
        return self.fields["velocity_dispersion"]

    # ---------------------------------------------------- magnetic fields
    def set_magnetic_field_from_beta(self, beta, gaussian=True):
        """B = sqrt(8 pi P / beta) (Gaussian) or sqrt(2 P / beta) (LH)
        (model.py:718-739).  Stored in gauss."""
        # galactic pressure -> cgs (erg/cm^3 = gauss^2 / 8 pi)
        p_cgs = self.fields["pressure"] * units.galactic_to_cgs_factor("pressure")
        B = np.sqrt(2.0 * p_cgs / beta)
        if gaussian:
            B *= np.sqrt(4.0 * np.pi)
        self.set_field("magnetic_field_strength", B)
        # consumers computing p_B = B^2/(8 pi) vs B^2/2 need the convention
        self.magnetic_gaussian = gaussian

    def set_magnetic_field_from_density(self, B0, eta=2.0 / 3.0, gaussian=True):
        """B = B0 (rho/rho_0)^eta (model.py:741-764).  B0 in gauss."""
        B = B0 * (self.fields["density"] / self.fields["density"][0]) ** eta
        if not gaussian:
            B = B / np.sqrt(4.0 * np.pi)
        self.set_field("magnetic_field_strength", B)
        self.magnetic_gaussian = gaussian

    # ------------------------------------------------------------ sampling
    def generate_tracer_particles(self, num_particles, r_max=None,
                                  sub_sample=1, prng=None):
        """Tracer particles following the gas distribution
        (model.py:766-836)."""
        from ..sampling import generate_tracer_particles

        return generate_tracer_particles(self, num_particles, r_max=r_max,
                                         sub_sample=sub_sample, prng=prng)

    def generate_gas_particles(self, num_particles, r_max=None, sub_sample=1,
                               compute_potential=False, prng=None):
        """Gas particles in HSE (model.py:838-947)."""
        from ..sampling import generate_gas_particles

        return generate_gas_particles(self, num_particles, r_max=r_max,
                                      sub_sample=sub_sample,
                                      compute_potential=compute_potential,
                                      prng=prng)

    def generate_dm_particles(self, num_particles, r_max=None, sub_sample=1,
                              compute_potential=False, prng=None):
        """Virialized DM particles (model.py:949-993)."""
        return self.dm_virial.generate_particles(
            num_particles, r_max=r_max, sub_sample=sub_sample,
            compute_potential=compute_potential, prng=prng)

    def generate_star_particles(self, num_particles, r_max=None, sub_sample=1,
                                compute_potential=False, prng=None):
        """Virialized star particles (model.py:995-1039)."""
        return self.star_virial.generate_particles(
            num_particles, r_max=r_max, sub_sample=sub_sample,
            compute_potential=compute_potential, prng=prng)

    # ------------------------------------------------------------ plotting
    def plot(self, field, r_min=None, r_max=None, fig=None, ax=None, **kwargs):
        """loglog plot of a field (model.py:1041-1086)."""
        import matplotlib.pyplot as plt

        if fig is None:
            fig = plt.figure(figsize=(10, 10))
        if ax is None:
            ax = fig.add_subplot(111)
        ax.loglog(self["radius"], self[field], **kwargs)
        ax.set_xlim(r_min, r_max)
        ax.set_xlabel("Radius (kpc)")
        from ..utils import field_label_map

        ax.set_ylabel(field_label_map.get(field, ""))
        return fig, ax

    # ------------------------------------------------------------- dataset
    def create_dataset(self, filename, domain_dimensions=(512, 512, 512),
                       left_edge=None, box_size=None, overwrite=False,
                       chunksize=64, dtype="f8", engine="device"):
        """Write this model onto a chunked uniform grid consumable by yt
        (model.py:1115-1196).

        ``dtype="f4"`` halves the on-disk bytes (the 512^3 build is
        disk-bound); ``engine="native"`` paints on the host C++ painter
        instead of the accelerator (see YTHDF5.add_model)."""
        from ..data_structures import YTHDF5

        rmax = float(np.amax(self["radius"]))
        if left_edge is None:
            left_edge = 3 * [-rmax]
        if box_size is None:
            box_size = 3 * [2.0 * rmax]
        left_edge = np.asarray(left_edge, dtype=np.float64)
        box_size = np.asarray(box_size, dtype=np.float64)
        bbox = np.array([[le, le + bs] for le, bs in zip(left_edge, box_size)],
                        dtype="float64")
        ds_obj = YTHDF5.build(filename, domain_dimensions, bbox,
                              chunksize=chunksize, overwrite=overwrite,
                              dtype=dtype)
        ds_obj.add_model(self, [0, 0, 0], [0, 0, 0], engine=engine)
        return ds_obj.filename


class HydrostaticEquilibrium(ClusterModel):
    """Backwards-compatible alias (model.py:1199-1201)."""
