"""Initial-condition scenes: 1-3 clusters with centers/velocities
(reference ics.py:22-497)."""

from __future__ import annotations

import os
from collections import defaultdict
from numbers import Number

import numpy as np

from .model import ClusterModel
from .particles import (
    ClusterParticles,
    _ensure_list,
    combine_three_clusters,
    combine_two_clusters,
    resample_one_cluster,
    resample_three_clusters,
    resample_two_clusters,
)
from .sampling import parse_prng

__all__ = ["ClusterICs", "compute_centers_for_binary"]


def compute_centers_for_binary(center, d, b, a=0.0):
    """Centers of a binary merger from distance + impact parameters
    (ics.py:22-57)."""
    d = np.sqrt(d * d - b * b - a * a)
    diff = np.array([d, b, a])
    center = np.asarray(center, dtype=np.float64)
    center1 = center - 0.5 * diff
    center2 = center + 0.5 * diff
    return center1, center2


class ClusterICs:
    """A 1-3 cluster merger scene (ics.py:60-497)."""

    def __init__(self, basename, num_halos, profiles, center, velocity,
                 num_particles=None, mag_file=None, particle_files=None,
                 r_max=20000.0, r_max_tracer=None):
        self.basename = basename
        self.num_halos = num_halos
        self.profiles = _ensure_list(profiles)
        self.center = np.asarray(center, dtype=np.float64).reshape(num_halos, 3)
        self.velocity = np.asarray(velocity, dtype=np.float64).reshape(
            num_halos, 3)
        self.mag_file = mag_file
        if isinstance(r_max, Number):
            r_max = [r_max] * num_halos
        self.r_max = np.array(r_max, dtype=np.float64)
        if r_max_tracer is None:
            r_max_tracer = r_max
        if isinstance(r_max_tracer, Number):
            r_max_tracer = [r_max_tracer] * num_halos
        self.r_max_tracer = np.array(r_max_tracer, dtype=np.float64)
        if num_particles is None:
            self.tot_np = {"dm": 0, "gas": 0, "star": 0, "tracer": 0}
        else:
            self.tot_np = num_particles
        self._models: dict[int, ClusterModel] = {}
        self._determine_num_particles()
        self.particle_files = [None] * 3
        if particle_files is not None:
            given = _ensure_list(particle_files)
            if len(given) > num_halos:
                raise ValueError(
                    f"{len(given)} particle_files for {num_halos} halos")
            # explicit per-slot assignment: a length-changing slice
            # (particle_files[:num_halos] = given) SHRINKS the 3-slot
            # list when fewer entries than halos are passed, turning
            # the missing-slot None into an IndexError downstream
            for i, pf in enumerate(given):
                self.particle_files[i] = pf

    def load_model(self, i):
        """The i-th profile as a :class:`ClusterModel`, loaded once and
        cached — the setup paths (counts, particle generation, combines,
        exporter tables) otherwise re-read the same HDF5 profile three
        to four times per halo.

        The returned instance IS the cached one (not a copy): mutating
        its fields mutates what every subsequent setup call on this
        ``ClusterICs`` consumes.  To experiment on a model, reload it
        independently (``ClusterModel.from_h5_file(ics.profiles[i])``)
        instead of editing the shared instance."""
        if i not in self._models:
            self._models[i] = ClusterModel.from_h5_file(self.profiles[i])
        return self._models[i]

    def _determine_num_particles(self):
        """Pro-rate total particle counts by per-halo masses
        (ics.py:100-160)."""
        dm_masses, gas_masses, star_masses, tracer_masses = [], [], [], []
        for i in range(len(self.profiles)):
            p = self.load_model(i)
            idxs = p["radius"] < self.r_max[i]
            dm_masses.append(p["dark_matter_mass"][idxs][-1])
            gmass = p["gas_mass"][idxs][-1] if "gas_mass" in p else 0.0
            gas_masses.append(gmass)
            smass = (p["stellar_mass"][idxs][-1]
                     if "stellar_mass" in p else 0.0)
            star_masses.append(smass)
            if self.tot_np.get("tracer", 0) > 0:
                idxst = p["radius"] < self.r_max_tracer[i]
                tmass = p["gas_mass"][idxst][-1]
            else:
                tmass = 0.0
            tracer_masses.append(tmass)
        tots = {"dm": np.sum(dm_masses), "gas": np.sum(gas_masses),
                "star": np.sum(star_masses), "tracer": np.sum(tracer_masses)}
        masses = {"dm": dm_masses, "gas": gas_masses, "star": star_masses,
                  "tracer": tracer_masses}
        self.num_particles = defaultdict(list)
        for i in range(self.num_halos):
            for key in ["dm", "gas", "star", "tracer"]:
                if self.tot_np.get(key, 0) > 0:
                    n = np.rint(self.tot_np[key] * masses[key][i]
                                / tots[key]).astype("int")
                else:
                    n = 0
                self.num_particles[key].append(int(n))

    def _generate_particles(self, output_directory=None,
                            regenerate_particles=False, prng=None):
        """Generate (or reload cached) per-halo particles (ics.py:162-200)."""
        if output_directory is None:
            output_directory = ""
        key = parse_prng(prng)
        import jax

        parts = []
        for i, pf in enumerate(self.profiles):
            if regenerate_particles or self.particle_files[i] is None:
                key, k_dm, k_star, k_gas, k_tr = jax.random.split(key, 5)
                m = self.load_model(i)
                p = m.generate_dm_particles(
                    self.num_particles["dm"][i], r_max=self.r_max[i],
                    prng=k_dm)
                if self.num_particles["star"][i] > 0:
                    sp = m.generate_star_particles(
                        self.num_particles["star"][i], r_max=self.r_max[i],
                        prng=k_star)
                    p = p + sp
                if self.num_particles["gas"][i] > 0:
                    gp = m.generate_gas_particles(
                        self.num_particles["gas"][i], r_max=self.r_max[i],
                        prng=k_gas)
                    p = p + gp
                if self.num_particles["tracer"][i] > 0:
                    tp = m.generate_tracer_particles(
                        self.num_particles["tracer"][i],
                        r_max=self.r_max_tracer[i], prng=k_tr)
                    p = p + tp
                parts.append(p)
                outfile = os.path.join(output_directory,
                                       f"{self.basename}_{i}_particles.h5")
                p.write_particles(outfile, overwrite=True)
                self.particle_files[i] = outfile
            else:
                p = ClusterParticles.from_file(self.particle_files[i])
                parts.append(p)
        return parts

    # ----------------------------------------------------------------- I/O
    def to_file(self, filename, overwrite=False):
        """Write the scene description to YAML (ics.py:202-283).

        Matches the reference's ruamel output — one key per line with an
        EOL comment — emitted with plain PyYAML (one single-key dump per
        line, flow-style sequences) so no extra dependency is needed; any
        YAML 1.1 loader (including the reference's) reads it back.
        """
        if os.path.exists(filename) and not overwrite:
            raise RuntimeError(f"{filename} exists and overwrite=False!")
        import yaml

        out = [("basename", self.basename, "base name for ICs"),
               ("num_halos", self.num_halos, "number of halos")]
        for i in range(self.num_halos):
            out.append((f"profile{i+1}", self.profiles[i],
                        f"profile for cluster {i+1}"))
            out.append((f"center{i+1}", [float(v) for v in self.center[i]],
                        f"center for cluster {i+1}"))
            out.append((f"velocity{i+1}",
                        [float(v) for v in self.velocity[i]],
                        f"velocity for cluster {i+1}"))
            if self.particle_files[i] is not None:
                out.append((f"particle_file{i+1}", self.particle_files[i],
                            f"particle file for cluster {i+1}"))
        for key, name, label in [("dm", "num_dm_particles", "DM"),
                                 ("gas", "num_gas_particles", "gas"),
                                 ("star", "num_star_particles", "star"),
                                 ("tracer", "num_tracer_particles",
                                  "tracer")]:
            if self.tot_np.get(key, 0) > 0:
                out.append((name, int(self.tot_np[key]),
                            f"number of {label} particles"))
        if self.mag_file is not None:
            out.append(("mag_file", self.mag_file, "3D magnetic field file"))
        out.append(("r_max", [float(v) for v in self.r_max],
                    "Maximum radii of particles"))
        if self.tot_np.get("tracer", 0) > 0:
            out.append(("r_max_tracer",
                        [float(v) for v in self.r_max_tracer],
                        "Maximum radii of tracer particles"))
        with open(filename, "w") as f:
            for key, value, comment in out:
                # block-style mapping, flow-style (inline) sequences
                flow = None if isinstance(value, list) else False
                line = yaml.safe_dump({key: value}, sort_keys=False,
                                      default_flow_style=flow,
                                      width=10**9).strip()
                f.write(f"{line}   # {comment}\n")

    @classmethod
    def from_file(cls, filename):
        """Read a scene description from YAML (ics.py:285-321)."""
        import yaml

        with open(filename, "r") as f:
            params = yaml.safe_load(f)
        num_halos = params["num_halos"]
        profiles = [params[f"profile{i}"] for i in range(1, num_halos + 1)]
        center = [np.array(params[f"center{i}"])
                  for i in range(1, num_halos + 1)]
        velocity = [np.array(params[f"velocity{i}"])
                    for i in range(1, num_halos + 1)]
        num_particles = {k: params.get(f"num_{k}_particles", 0)
                         for k in ["gas", "dm", "star", "tracer"]}
        particle_files = [params.get(f"particle_file{i}", None)
                          for i in range(1, num_halos + 1)]
        return cls(params["basename"], num_halos, profiles, center, velocity,
                   num_particles=num_particles,
                   mag_file=params.get("mag_file", None),
                   particle_files=particle_files,
                   r_max=params.get("r_max", 20000.0),
                   r_max_tracer=params.get("r_max_tracer",
                                           params.get("r_max", 20000.0)))

    # ------------------------------------------------------------ assembly
    def setup_particle_ics(self, output_directory=None,
                           regenerate_particles=False, prng=None):
        """Generate and combine all halos' particles (ics.py:323-375)."""
        profiles = [self.load_model(i) for i in range(self.num_halos)]
        parts = self._generate_particles(
            output_directory=output_directory,
            regenerate_particles=regenerate_particles, prng=prng)
        if self.num_halos == 1:
            all_parts = parts[0]
            all_parts.add_offsets(self.center[0], self.velocity[0])
        elif self.num_halos == 2:
            all_parts = combine_two_clusters(
                parts[0], parts[1], profiles[0], profiles[1], self.center[0],
                self.center[1], self.velocity[0], self.velocity[1])
        else:
            all_parts = combine_three_clusters(
                parts[0], parts[1], parts[2], profiles[0], profiles[1],
                profiles[2], self.center[0], self.center[1], self.center[2],
                self.velocity[0], self.velocity[1], self.velocity[2])
        return all_parts

    def resample_particle_ics(self, parts, passive_scalars=None):
        """Resample profiles onto relaxed particles (ics.py:377-422)."""
        profiles = [self.load_model(i) for i in range(self.num_halos)]
        if self.num_halos == 1:
            return resample_one_cluster(parts, profiles[0], self.center[0],
                                        self.velocity[0])
        if self.num_halos == 2:
            return resample_two_clusters(
                parts, profiles[0], profiles[1], self.center[0],
                self.center[1], self.velocity[0], self.velocity[1],
                self.r_max, passive_scalars=passive_scalars)
        return resample_three_clusters(
            parts, profiles[0], profiles[1], profiles[2], self.center[0],
            self.center[1], self.center[2], self.velocity[0],
            self.velocity[1], self.velocity[2], self.r_max,
            passive_scalars=passive_scalars)

    def create_dataset(self, filename, domain_dimensions=(512, 512, 512),
                       left_edge=None, box_size=None, overwrite=False,
                       chunksize=64):
        """Chunked uniform-grid dataset of the whole scene (ics.py:424-497)."""
        from .data_structures import YTHDF5

        if left_edge is None:
            left_edge = 3 * [-np.amax(self.r_max)]
        if box_size is None:
            box_size = 2 * np.amax(self.r_max)
        bbox = [[le, le + box_size] for le in left_edge]
        ds_obj = YTHDF5.build(filename, domain_dimensions, bbox,
                              chunksize=chunksize, overwrite=overwrite)
        ds_obj.add_ICs(self)
        return ds_obj.filename
