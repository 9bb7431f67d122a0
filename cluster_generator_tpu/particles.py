"""Particle containers, combination and Gadget I/O.

Rebuild of ``cluster_generator/particles.py``: the :class:`ClusterParticles`
container is a (ptype, field)-keyed dict of float64 numpy arrays in galactic
units; the gas-mixing math of ``_sample_clusters`` (particles.py:587-639) is
vectorized over (halo, particle) with jnp instead of per-halo python loops +
scipy splines.
"""

from __future__ import annotations

import math
from collections import OrderedDict, defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .core import constants as C
from .core.interp import cubic_spline, spline_eval
from .core.logging import mylog

__all__ = [
    "ClusterParticles", "combine_two_clusters", "combine_three_clusters",
    "resample_one_cluster", "resample_two_clusters", "resample_three_clusters",
    "gadget_fields", "ptype_map", "rptype_map",
]

# ---------------------------------------------------------------- gadget maps
# (reference particles.py:13-75)
gadget_fields = {
    "dm": ["Coordinates", "Velocities", "Masses", "ParticleIDs", "Potential"],
    "gas": ["Coordinates", "Velocities", "Masses", "ParticleIDs",
            "InternalEnergy", "MagneticField", "Density", "Potential"],
    "star": ["Coordinates", "Velocities", "Masses", "ParticleIDs", "Potential"],
    "black_hole": ["Coordinates", "Velocities", "Masses", "ParticleIDs"],
    "tracer": ["Coordinates"],
}

code_fields = {"arepo": {"gas": ["PassiveScalars", "GFM_Metallicity"]}}

gadget_field_map = {
    "Coordinates": "particle_position",
    "Velocities": "particle_velocity",
    "Masses": "particle_mass",
    "Density": "density",
    "Potential": "potential_energy",
    "InternalEnergy": "thermal_energy",
    "MagneticField": "magnetic_field",
    "Metallicity": "metallicity",
    "GFM_Metallicity": "metallicity",
}

# conversion factor: galactic value / factor = gadget-file value
_MSUN_G = C.MSUN_KG * 1.0e3
_B_GADGET_IN_GAUSS = 1.0e5 * math.sqrt(_MSUN_G) * 1.0e5 / C.CM_PER_KPC**1.5

gadget_field_factors = {
    "Coordinates": 1.0,                      # kpc
    "Velocities": C.km_s,                    # km/s
    "Masses": 1.0e10,                        # 1e10 Msun
    "Density": 1.0e10,                       # 1e10 Msun/kpc^3
    "InternalEnergy": C.km_s**2,             # km^2/s^2
    "Potential": C.km_s**2,                  # km^2/s^2
    "PassiveScalars": 1.0,
    "MagneticField": _B_GADGET_IN_GAUSS,     # stored in gauss internally
    "Metallicity": 1.0,
    "GFM_Metallicity": 1.0,
}

ptype_map = OrderedDict([
    ("PartType0", "gas"), ("PartType1", "dm"), ("PartType2", "tracer"),
    ("PartType4", "star"), ("PartType5", "black_hole"),
])
rptype_map = OrderedDict([(v, k) for k, v in ptype_map.items()])

#: native HDF5 units metadata for particle fields
particle_field_units = {
    "particle_position": "kpc",
    "particle_velocity": "kpc/Myr",
    "particle_mass": "Msun",
    "particle_potential": "kpc**2/Myr**2",
    "potential_energy": "kpc**2/Myr**2",
    "thermal_energy": "kpc**2/Myr**2",
    "density": "Msun/kpc**3",
    "magnetic_field": "gauss",
    "velocity": "kpc/Myr",
    "magnetic_vector_potential": "gauss*kpc",
    "metallicity": "",
}


def _ensure_list(x):
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


class ClusterParticles:
    """Container for multi-species particle ICs (particles.py:78-584)."""

    @staticmethod
    def _coerce(key, value):
        # particle_index carries Gadget IDs: keep its integer dtype (a
        # blanket f64 cast silently floated the IDs and made from_file's
        # dtype-preserving read pointless)
        if key[1] == "particle_index":
            return np.asarray(value)
        return np.asarray(value, dtype=np.float64)

    def __init__(self, particle_types, fields):
        self.particle_types = _ensure_list(particle_types)
        self.fields = OrderedDict(
            (k, self._coerce(k, v)) for k, v in fields.items())
        self._update_num_particles()
        self._update_field_names()
        self.passive_scalars: list[str] = []

    def __repr__(self):
        counts = ", ".join(f"{k}: {v:,}" for k, v in self.num_particles.items())
        return f"<ClusterParticles {{{counts}}}>"

    __str__ = __repr__

    def __getitem__(self, key):
        return self.fields[key]

    def __setitem__(self, key, value):
        self.fields[key] = self._coerce(key, value)

    def keys(self):
        return self.fields.keys()

    def _update_num_particles(self):
        self.num_particles = {}
        for ptype in self.particle_types:
            self.num_particles[ptype] = self.fields[ptype, "particle_mass"].size

    def _update_field_names(self):
        self.field_names = defaultdict(list)
        for field in self.fields:
            self.field_names[field[0]].append(field[1])

    def _clip_to_box(self, ptype, box_size):
        """Mask of particles inside the Gadget box [0, box_size]^3.

        Gadget boxes start at the ORIGIN, so a scene built around (0,0,0)
        must be offset (e.g. centers near box_size/2) before writing —
        the reference silently drops out-of-box particles
        (particles.py:495-500); here a large drop is logged loudly
        because an origin-centered scene loses exactly 7/8 of its
        particles to the positive octant."""
        pos = self.fields[ptype, "particle_position"]
        keep = ~np.logical_or((pos < 0.0).any(axis=1),
                              (pos > box_size).any(axis=1))
        dropped = keep.size - int(keep.sum())
        if dropped > 0.05 * keep.size:
            mylog.warning(
                "write_to_gadget_file: dropping %d/%d %s particles outside "
                "the box [0, %g]^3 — center your scene inside the box "
                "(e.g. centers near box_size/2)", dropped, keep.size,
                ptype, box_size)
        return keep

    def __add__(self, other):
        """Concatenate two containers.  For particle types BOTH operands
        carry, only fields present in both survive — a field of one
        operand has no values for the other's particles, so keeping it
        (the reference's behavior, particles.py:103-110) left the array
        shorter than the particle count and broke every masked cut and
        writer downstream.  Dropped names are logged loudly.  Passive-
        scalar registrations carry over for scalars that survive (they
        were silently reset to [] before)."""
        shared = set(self.particle_types) & set(other.particle_types)
        fields = OrderedDict()
        for field, arr in self.fields.items():
            if field[0] not in shared:
                fields[field] = arr
            elif field in other.fields:
                fields[field] = np.concatenate([arr, other[field]])
            else:
                mylog.warning(
                    "ClusterParticles.__add__: dropping %s — present in "
                    "only one operand (no values exist for the other's "
                    "particles)", field)
        for field, arr in other.fields.items():
            if field[0] not in shared:
                fields[field] = arr
            elif field not in self.fields:
                mylog.warning(
                    "ClusterParticles.__add__: dropping %s — present in "
                    "only one operand (no values exist for the other's "
                    "particles)", field)
        particle_types = list(set(self.particle_types + other.particle_types))
        out = ClusterParticles(particle_types, fields)
        out.passive_scalars = [
            s for s in dict.fromkeys(self.passive_scalars
                                     + other.passive_scalars)
            if ("gas", s) in fields]
        return out

    @property
    def num_passive_scalars(self):
        return len(self.passive_scalars)

    def drop_ptypes(self, ptypes):
        """Remove all particles of the given types (particles.py:125-137)."""
        ptypes = _ensure_list(ptypes)
        for ptype in ptypes:
            self.particle_types.remove(ptype)
            for name in list(self.fields.keys()):
                if name[0] in ptypes:
                    self.fields.pop(name)
        self._update_num_particles()
        self._update_field_names()

    def make_radial_cut(self, r_max, center=None, ptypes=None):
        """Drop particles outside ``r_max`` (particles.py:139-168)."""
        rm2 = r_max * r_max
        if center is None:
            center = np.zeros(3)
        if ptypes is None:
            ptypes = self.particle_types
        for part in _ensure_list(ptypes):
            cidx = (((self[part, "particle_position"] - center) ** 2)
                    .sum(axis=1) <= rm2)
            for field in self.field_names[part]:
                self.fields[part, field] = self.fields[part, field][cidx]
        self._update_num_particles()

    def add_black_hole(self, bh_mass, pos=None, vel=None, use_pot_min=False):
        """Append a BH particle (particles.py:170-225)."""
        mass = np.array([bh_mass], dtype=np.float64)
        if use_pot_min:
            # accept either name: the generators (ours and the
            # reference's, virial.py:234) store 'particle_potential',
            # while the reference's add_black_hole only ever looked for
            # 'potential_energy' — a key it never wrote
            for key in (("dm", "potential_energy"),
                        ("dm", "particle_potential")):
                if key in self.fields:
                    break
            else:
                raise KeyError("('dm', 'potential_energy') / ('dm', "
                               "'particle_potential') is not available!")
            idx = np.argmin(self.fields[key])
            pos = self.fields["dm", "particle_position"][idx].reshape(1, 3)
            vel = self.fields["dm", "particle_velocity"][idx].reshape(1, 3)
        else:
            pos = (np.zeros((1, 3)) if pos is None
                   else np.asarray(pos, dtype=np.float64).reshape(1, 3))
            vel = (np.zeros((1, 3)) if vel is None
                   else np.asarray(vel, dtype=np.float64).reshape(1, 3))
        if "black_hole" not in self.particle_types:
            self.particle_types.append("black_hole")
            self.fields["black_hole", "particle_position"] = pos
            self.fields["black_hole", "particle_velocity"] = vel
            self.fields["black_hole", "particle_mass"] = mass
        else:
            ap = lambda x, y: np.append(x, y, axis=0)
            self.fields["black_hole", "particle_position"] = ap(
                self.fields["black_hole", "particle_position"], pos)
            self.fields["black_hole", "particle_velocity"] = ap(
                self.fields["black_hole", "particle_velocity"], vel)
            self.fields["black_hole", "particle_mass"] = ap(
                self.fields["black_hole", "particle_mass"], mass)
        self._update_num_particles()
        self._update_field_names()

    # ------------------------------------------------------------------ IO
    @classmethod
    def from_fields(cls, fields):
        particle_types = []
        for key in fields:
            if key[0] not in particle_types:
                particle_types.append(key[0])
        return cls(particle_types, fields)

    @classmethod
    def from_file(cls, filename, ptypes=None):
        """Read native-HDF5 particles (particles.py:236-274)."""
        import h5py

        from .core.h5raw import RawReader

        fields = OrderedDict()
        with h5py.File(filename, "r") as f, RawReader(f) as raw:
            if ptypes is None:
                ptypes = list(f.keys())
            ptypes = _ensure_list(ptypes)
            for ptype in ptypes:
                for field in f[ptype]:
                    arr = raw.read(f[ptype][field])
                    if field == "particle_index":
                        fields[ptype, field] = np.asarray(arr)
                    else:
                        fields[ptype, field] = arr.astype(np.float64)
        return cls(ptypes, fields)

    from_h5_file = from_file

    @classmethod
    def from_gadget_file(cls, filename, ptypes=None):
        """Read a Gadget/AREPO/GIZMO HDF5 snapshot (particles.py:281-335)."""
        import h5py

        from .core.h5raw import RawReader

        fields = OrderedDict()
        particle_types = []
        with h5py.File(filename, "r") as f, RawReader(f) as raw:
            if ptypes is None:
                ptypes = [k for k in f if k.startswith("PartType")]
            else:
                ptypes = [rptype_map[k] for k in _ensure_list(ptypes)]
            for ptype in ptypes:
                my_ptype = ptype_map[ptype]
                particle_types.append(my_ptype)
                g = f[ptype]
                for field in gadget_fields[my_ptype]:
                    if field in g:
                        if field == "ParticleIDs":
                            fields[my_ptype, "particle_index"] = g[field][:]
                        else:
                            fd = gadget_field_map[field]
                            fields[my_ptype, fd] = (
                                raw.read(g[field]).astype(np.float64)
                                * gadget_field_factors[field])
                if "Masses" not in g:
                    n_ptype = g["ParticleIDs"].size
                    n_type = int(ptype[-1])
                    m = f["Header"].attrs["MassTable"][n_type]
                    fields[my_ptype, "particle_mass"] = (
                        m * gadget_field_factors["Masses"]
                        * np.ones(n_ptype))
        return cls(particle_types, fields)

    @classmethod
    def from_gadget_files(cls, filenames, ptypes=None):
        """Read a multi-file Gadget snapshot (``NumFilesPerSnapshot > 1``).

        ``filenames``: either an explicit list of shard paths, or a single
        path to shard 0 (``...0.h5`` / ``...0.hdf5``) from which the
        remaining shard names are derived using the header's
        ``NumFilesPerSnapshot``.  Shards are concatenated in file order, so
        round-trips preserve the particle order of
        :func:`~cluster_generator_tpu.parallel.export
        .write_sharded_gadget_files`.
        """
        import h5py

        if isinstance(filenames, (str, Path)):
            first = Path(filenames)
            with h5py.File(first, "r") as f:
                n_files = int(f["Header"].attrs["NumFilesPerSnapshot"])
            stem, suffix = first.name, first.suffix
            assert stem.endswith(f".0{suffix}"), \
                (f"Pass shard 0 (named *.0{suffix}) or an explicit list; "
                 f"got {first}")
            base = stem[: -len(f".0{suffix}")]
            filenames = [first.parent / f"{base}.{i}{suffix}"
                         for i in range(n_files)]
        shards = [cls.from_gadget_file(fn, ptypes=ptypes)
                  for fn in filenames]
        out = shards[0]
        for s in shards[1:]:
            out = out + s
        return out

    def write_particles(self, output_filename, overwrite=False):
        """Write native-HDF5 particles (particles.py:337-363)."""
        import h5py

        if Path(output_filename).exists() and not overwrite:
            raise IOError(f"Cannot create {output_filename}. "
                          "It exists and overwrite=False.")
        from .core.h5raw import RawWriter

        with h5py.File(output_filename, "w") as f:
            for ptype in self.particle_types:
                f.create_group(ptype)
            raw = RawWriter(f)  # pwrite-at-offset (see core/h5raw.py)
            for (ptype, name), arr in self.fields.items():
                ds = raw.add(f[ptype], name, np.asarray(arr))
                if name != "particle_index":
                    ds.attrs["units"] = particle_field_units.get(name, "")
            raw.flush()

    def write_particles_to_h5(self, output_filename, overwrite=False):
        self.write_particles(output_filename, overwrite=overwrite)

    def set_field(self, ptype, name, value, units=None, add=False,
                  passive_scalar=False):
        """Add/update a particle field (particles.py:368-421).

        ``units``: if given, ``value`` is interpreted in that unit and
        converted to galactic base units for storage."""
        value = np.asarray(value, dtype=np.float64)
        if units is not None:
            from .core.units import to_galactic

            value = to_galactic(value, units)
        num_particles = self.num_particles[ptype]
        exists = (ptype, name) in self.fields
        if value.shape[0] != num_particles:
            raise ValueError(f"The length of the array needs to be "
                             f"{num_particles} particles!")
        if exists:
            if add:
                self.fields[ptype, name] = self.fields[ptype, name] + value
            else:
                mylog.warning("Overwriting field (%s, %s).", ptype, name)
                self.fields[ptype, name] = value
        else:
            if add:
                raise RuntimeError(f"Field ({ptype}, {name}) does not exist "
                                   "and add=True!")
            self.fields[ptype, name] = value
            if passive_scalar and ptype == "gas":
                self.passive_scalars.append(name)
        self._update_field_names()

    def add_offsets(self, r_ctr, v_ctr, ptypes=None):
        """Shift positions/velocities (particles.py:423-451)."""
        if ptypes is None:
            ptypes = self.particle_types
        r_ctr = np.asarray(r_ctr, dtype=np.float64)
        v_ctr = np.asarray(v_ctr, dtype=np.float64)
        for ptype in _ensure_list(ptypes):
            self.fields[ptype, "particle_position"] = (
                self.fields[ptype, "particle_position"] + r_ctr)
            self.fields[ptype, "particle_velocity"] = (
                self.fields[ptype, "particle_velocity"] + v_ctr)

    # ------------------------------------------------------------- gadget
    def _write_gadget_fields(self, ptype, h5_group, idxs, dtype, code,
                             raw=None):
        fields = list(gadget_fields[ptype])
        if code in code_fields:
            fields += code_fields[code].get(ptype, [])
        _add = (raw.add if raw is not None
                else lambda g, k, v: g.create_dataset(k, data=v))
        for field in fields:
            if field == "ParticleIDs":
                continue
            if field == "PassiveScalars":
                if self.num_passive_scalars > 0:
                    data = np.stack([self[ptype, s] for s in
                                     self.passive_scalars], axis=-1)
                    _add(h5_group, "PassiveScalars", data[idxs])
            else:
                my_field = gadget_field_map[field]
                if ((ptype, my_field) not in self.fields
                        and my_field == "potential_energy"
                        and (ptype, "particle_potential") in self.fields):
                    # the generators store 'particle_potential' (same in
                    # the reference, whose writer therefore silently
                    # dropped the Potential block it advertised)
                    my_field = "particle_potential"
                if (ptype, my_field) in self.fields:
                    fd = self.fields[ptype, my_field]
                    data = (fd[idxs] / gadget_field_factors[field]).astype(dtype)
                    _add(h5_group, field, data)

    def write_to_gadget_file(self, ic_filename, box_size, dtype="float32",
                             overwrite=False, code=None, num_files=1,
                             file_num=0, id_offset=0, npart_total=None):
        """Write a Gadget-HDF5 IC file (particles.py:475-552).

        ``num_files``/``file_num``/``id_offset``/``npart_total`` support
        multi-file snapshots (``NumFilesPerSnapshot > 1``): this container
        becomes file ``file_num`` of ``num_files`` with particle IDs
        starting at ``id_offset + 1`` and ``NumPart_Total`` taken from
        ``npart_total`` (a uint32[6]); when ``npart_total`` is None the
        totals are written equal to ``NumPart_ThisFile`` and multi-file
        callers patch them afterwards
        (:func:`~cluster_generator_tpu.parallel.export
        .write_sharded_gadget_files` handles both).  Returns the per-type
        counts written to this file.
        """
        import h5py

        if Path(ic_filename).exists() and not overwrite:
            raise IOError(f"Cannot create {ic_filename}. "
                          "It exists and overwrite=False.")
        num_particles = {}
        npart = id_offset
        mass_table = np.zeros(6)
        from .core.h5raw import RawWriter

        with h5py.File(ic_filename, "w") as f:
            raw = RawWriter(f)  # pwrite-at-offset (see core/h5raw.py)
            for ptype in self.particle_types:
                gptype = rptype_map[ptype]
                idxs = self._clip_to_box(ptype, box_size)
                num_particles[ptype] = int(idxs.sum())
                g = f.create_group(gptype)
                self._write_gadget_fields(ptype, g, idxs, dtype, code,
                                          raw=raw)
                ids = np.arange(num_particles[ptype]) + 1 + npart
                g.create_dataset("ParticleIDs", data=ids.astype("uint32"))
                npart += num_particles[ptype]
                if ptype in ["star", "dm", "black_hole"] \
                        and num_particles[ptype] > 0:
                    raw.flush()  # Masses must be ON DISK before read-back
                    mass_table[int(rptype_map[ptype][-1])] = g["Masses"][0]
            raw.flush()
            hg = f.create_group("Header")
            hg.attrs["Time"] = 0.0
            hg.attrs["Redshift"] = 0.0
            hg.attrs["BoxSize"] = box_size
            hg.attrs["Omega0"] = 0.0
            hg.attrs["OmegaLambda"] = 0.0
            hg.attrs["HubbleParam"] = 1.0
            hg.attrs["NumPart_ThisFile"] = np.array(
                [num_particles.get("gas", 0), num_particles.get("dm", 0),
                 num_particles.get("tracer", 0), 0,
                 num_particles.get("star", 0),
                 num_particles.get("black_hole", 0)], dtype="uint32")
            hg.attrs["NumPart_Total"] = (
                hg.attrs["NumPart_ThisFile"] if npart_total is None
                else np.asarray(npart_total, dtype="uint32"))
            hg.attrs["NumPart_Total_HighWord"] = np.zeros(6, dtype="uint32")
            hg.attrs["NumFilesPerSnapshot"] = int(num_files)
            hg.attrs["MassTable"] = mass_table
            for flag in ["Flag_Sfr", "Flag_Cooling", "Flag_StellarAge",
                         "Flag_Metals", "Flag_Feedback",
                         "Flag_DoublePrecision", "Flag_IC_Info"]:
                hg.attrs[flag] = 0
            if code == "arepo":
                cg = f.create_group("Config")
                cg.attrs["VORONOI"] = 1
        return num_particles

    def to_yt_dataset(self, box_size, ptypes=None):
        """In-memory yt particle dataset (particles.py:554-584).

        Requires ``yt`` (optional dependency)."""
        from yt import load_particles  # noqa: optional

        data = {}
        if ptypes is None:
            ptypes = self.particle_types
        for key, val in self.fields.items():
            if key[0] not in ptypes:
                continue
            ptype, fname = key
            if fname == "particle_position":
                for i, ax in enumerate("xyz"):
                    data[ptype, f"particle_position_{ax}"] = (val[:, i], "kpc")
            elif fname == "particle_velocity":
                for i, ax in enumerate("xyz"):
                    data[ptype, f"particle_velocity_{ax}"] = (val[:, i], "kpc/Myr")
            else:
                data[ptype, fname] = (val, particle_field_units.get(fname, ""))
        return load_particles(data, length_unit="kpc",
                              bbox=np.array([[0.0, box_size]] * 3),
                              mass_unit="Msun", time_unit="Myr")


# ----------------------------------------------------------- cluster mixing
def _sample_clusters(particles, hses, center, velocity, radii=None,
                     resample=False, passive_scalars=None):
    """Mix overlapping gas distributions (behavioral parity with reference
    particles.py:587-639; internals redesigned).

    Each halo's gas density is evaluated at every particle position and
    summed; thermal energy and bulk momentum mix density-weighted:
        rho   = sum_h rho_h(r_h)
        e_int = sum_h e_h rho_h / rho
        v     = sum_h v_h rho_h / rho
    The sweep is vectorized over the PARTICLE axis (one batched spline
    evaluation per halo); the halo axis is a static 1-3 iteration unroll,
    which — unlike a stacked vmap — supports halos whose models were
    built on DIFFERENT radial grid sizes, as the reference's per-halo
    spline loop does.
    """
    scalars = list(passive_scalars) if passive_scalars else []
    halo_centers = jnp.asarray(np.asarray(center, dtype=np.float64))
    bulk_velocities = np.asarray(velocity, dtype=np.float64)
    pos = jnp.asarray(particles["gas", "particle_position"])

    usable = []
    for i, h in enumerate(hses):
        if "density" in h:
            usable.append(i)
        else:
            mylog.warning("No density field found in %s. Skipping.", h)
    if not usable:
        raise ValueError(
            "Gas mixing needs at least one halo model with a 'density' "
            f"field; none of the {len(hses)} provided models has one.")

    # (H, N) halo-centric particle radii — built for ALL halos so the
    # radial cut matches the reference even when a halo lacks gas fields
    halo_radius_all = jnp.linalg.norm(
        pos[None, :, :] - halo_centers[:, None, :], axis=-1)
    if radii is None:
        in_cut = np.ones(pos.shape[0], dtype=bool)
    else:
        in_cut = np.asarray(jnp.any(
            halo_radius_all <= jnp.asarray(np.asarray(radii))[:, None],
            axis=0))

    rho = 0.0
    e_sum = 0.0
    mom = 0.0
    rho_per_halo = []
    for i in usable:
        h = hses[i]
        rr = jnp.asarray(h["radius"])
        # clamp to the model grid: gas draws start below rr[0] (the
        # sampling CDF begins at r=0) and most particles sit far beyond
        # the OTHER halo's r_max — boundary-polynomial extrapolation at
        # either end can turn density or 1.5 P/rho negative (the same
        # inherited wart fixed in _paint_chunk and sampling.py; the
        # reference extrapolates here too, particles.py:560-584)
        r_part = jnp.clip(halo_radius_all[i], rr[0], rr[-1])
        rho_i = spline_eval(cubic_spline(rr, jnp.asarray(h["density"])),
                            r_part)
        eint_grid = 1.5 * jnp.asarray(h["pressure"]) \
            / jnp.asarray(h["density"])
        e_sum = e_sum + spline_eval(cubic_spline(rr, eint_grid),
                                    r_part) * rho_i
        rho = rho + rho_i
        mom = mom + bulk_velocities[i][None, :] * rho_i[:, None]
        rho_per_halo.append(rho_i)

    dens = np.asarray(rho)
    eint = np.asarray(e_sum / rho)
    vel = np.asarray(mom / rho[:, None])
    if resample:
        vol = (particles["gas", "particle_mass"]
               / particles["gas", "density"])
        particles["gas", "particle_mass"][in_cut] = \
            dens[in_cut] * vol[in_cut]
    particles["gas", "density"][in_cut] = dens[in_cut]
    particles["gas", "thermal_energy"][in_cut] = eint[in_cut]
    particles["gas", "particle_velocity"][in_cut] = vel[in_cut]
    for name in scalars:
        mixed = 0.0
        for i, rho_i in zip(usable, rho_per_halo):
            h = hses[i]
            rr_h = jnp.asarray(h["radius"])
            sc = spline_eval(
                cubic_spline(rr_h, jnp.asarray(h[name])),
                jnp.clip(halo_radius_all[i], rr_h[0], rr_h[-1]))
            mixed = mixed + sc * rho_i
        particles["gas", name][in_cut] = np.asarray(mixed / rho)[in_cut]
    return particles


def combine_two_clusters(particles1, particles2, hse1, hse2, center1, center2,
                         velocity1, velocity2):
    """Two-cluster merger composition (particles.py:642-666)."""
    center1 = np.asarray(center1, dtype=np.float64)
    center2 = np.asarray(center2, dtype=np.float64)
    velocity1 = np.asarray(velocity1, dtype=np.float64)
    velocity2 = np.asarray(velocity2, dtype=np.float64)
    for particles, center in [(particles1, center1), (particles2, center2)]:
        if "gas" in particles.particle_types:
            particles.add_offsets(center, [0.0] * 3, ptypes=["gas"])
    for particles, center, velocity in [(particles1, center1, velocity1),
                                        (particles2, center2, velocity2)]:
        ptypes = [p for p in particles.particle_types if p != "gas"]
        particles.add_offsets(center, velocity, ptypes=ptypes)
    particles = particles1 + particles2
    if "gas" in particles.particle_types:
        particles = _sample_clusters(particles, [hse1, hse2],
                                     [center1, center2],
                                     [velocity1, velocity2])
    return particles


def combine_three_clusters(particles1, particles2, particles3, hse1, hse2,
                           hse3, center1, center2, center3, velocity1,
                           velocity2, velocity3):
    """Three-cluster merger composition (particles.py:669-715)."""
    centers = [np.asarray(c, dtype=np.float64)
               for c in (center1, center2, center3)]
    velocities = [np.asarray(v, dtype=np.float64)
                  for v in (velocity1, velocity2, velocity3)]
    parts = [particles1, particles2, particles3]
    for particles, center in zip(parts, centers):
        if "gas" in particles.particle_types:
            particles.add_offsets(center, [0.0] * 3, ptypes=["gas"])
    for particles, center, velocity in zip(parts, centers, velocities):
        ptypes = [p for p in particles.particle_types if p != "gas"]
        particles.add_offsets(center, velocity, ptypes=ptypes)
    particles = particles1 + particles2 + particles3
    if "gas" in particles.particle_types:
        particles = _sample_clusters(particles, [hse1, hse2, hse3], centers,
                                     velocities)
    return particles


def resample_one_cluster(particles, hse, center, velocity):
    """Resample profiles onto relaxed gas particles (particles.py:718-746)."""
    if "gas" not in particles.particle_types:
        return particles
    center = np.asarray(center, dtype=np.float64)
    velocity = np.asarray(velocity, dtype=np.float64)
    pos = jnp.asarray(particles["gas", "particle_position"])
    r = jnp.sqrt(((pos - jnp.asarray(center)) ** 2).sum(axis=1))
    rr = jnp.asarray(hse["radius"])
    r = jnp.clip(r, rr[0], rr[-1])  # see _sample_clusters' clamp comment
    dens = np.asarray(spline_eval(cubic_spline(rr, jnp.asarray(hse["density"])), r))
    e_arr = 1.5 * jnp.asarray(hse["pressure"]) / jnp.asarray(hse["density"])
    energy = np.asarray(spline_eval(cubic_spline(rr, e_arr), r))
    particles["gas", "thermal_energy"] = energy
    vol = particles["gas", "particle_mass"] / particles["gas", "density"]
    particles["gas", "particle_mass"] = dens * vol
    particles["gas", "particle_velocity"][:, :] = velocity
    particles["gas", "density"] = dens
    return particles


def resample_two_clusters(particles, hse1, hse2, center1, center2, velocity1,
                          velocity2, radii, passive_scalars=None):
    """(particles.py:749-769)."""
    return _sample_clusters(particles, [hse1, hse2], [center1, center2],
                            [velocity1, velocity2], radii=radii,
                            resample=True, passive_scalars=passive_scalars)


def resample_three_clusters(particles, hse1, hse2, hse3, center1, center2,
                            center3, velocity1, velocity2, velocity3, radii,
                            passive_scalars=None):
    """(particles.py:772-795)."""
    return _sample_clusters(particles, [hse1, hse2, hse3],
                            [center1, center2, center3],
                            [velocity1, velocity2, velocity3], radii=radii,
                            resample=True, passive_scalars=passive_scalars)
