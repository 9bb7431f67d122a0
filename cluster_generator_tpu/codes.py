"""Simulation-code exporters (reference codes.py:16-312): GAMER, FLASH,
RAMSES, AREPO setups plus the shared AMR particle writer."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .core import units
from .core.logging import mylog
from .particles import ClusterParticles

__all__ = ["write_amr_particles", "setup_gamer_ics", "setup_flash_ics",
           "setup_athena_ics", "setup_enzo_ics", "setup_ramses_ics",
           "setup_arepo_ics", "resample_arepo_ics", "setup_gizmo_ics",
           "setup_art_ics"]


def _cgs_factor(field):
    import cluster_generator_tpu.core.constants as C

    if field == "particle_position":
        return C.CM_PER_KPC
    if field == "particle_velocity":
        return C.CM_PER_KPC / C.MYR_S
    if field == "particle_mass":
        return C.MSUN_KG * 1.0e3
    return 1.0


def write_amr_particles(particles, output_filename, ptypes, ptype_num,
                        overwrite=True, in_cgs=False, format="hdf5"):
    """Write particles for GAMER/FLASH/RAMSES (codes.py:16-73)."""
    if Path(output_filename).exists() and not overwrite:
        raise IOError(f"Cannot create {output_filename}. "
                      "It exists and overwrite=False.")
    nparts = [particles.num_particles[ptype] for ptype in ptypes]
    if format == "hdf5":
        import h5py

        from .core.h5raw import RawWriter

        with h5py.File(output_filename, "w") as f:
            raw = RawWriter(f)  # pwrite-at-offset (see core/h5raw.py)
            for field in ["particle_position", "particle_velocity",
                          "particle_mass"]:
                fd = np.concatenate([particles[ptype, field]
                                     for ptype in ptypes], axis=0)
                if in_cgs:
                    fd = fd * _cgs_factor(field)
                raw.add(f, field, np.asarray(fd))
            fd = np.concatenate([ptype_num[ptype] * np.ones(nparts[i])
                                 for i, ptype in enumerate(ptypes)])
            raw.add(f, "particle_type", fd)
            raw.flush()
    elif format == "fortran":
        from scipy.io import FortranFile

        pdata = []
        num_particles = 0
        with FortranFile(output_filename, "w") as f:
            for field in ["particle_position", "particle_velocity",
                          "particle_mass"]:
                fd = np.concatenate([particles[ptype, field]
                                     for ptype in ptypes], axis=0)
                if in_cgs:
                    fd = fd * _cgs_factor(field)
                if field == "particle_mass":
                    num_particles = fd.size
                pdata.append(np.asarray(fd).astype("float64").T)
            f.write_record(num_particles)
            f.write_record(np.vstack(pdata).T)
    else:
        raise ValueError(f"Unknown format {format}")


def setup_gamer_ics(ics, regenerate_particles=False, use_tracers=False):
    """Input__TestProblem lines + per-halo particle/profile files for the
    GAMER ClusterMerger setup (codes.py:76-137)."""
    gamer_ptypes = ["dm", "star"]
    if use_tracers:
        gamer_ptypes.insert(0, "tracer")
    gamer_ptype_num = {"tracer": 0, "dm": 2, "star": 3}
    hses = [ics.load_model(i) for i in range(ics.num_halos)]
    parts = ics._generate_particles(regenerate_particles=regenerate_particles)
    outlines = [f"Merger_Coll_NumHalos\t\t{ics.num_halos}\t# number of halos"]
    for i in range(ics.num_halos):
        particle_file = f"{ics.basename}_gamerp_{i+1}.h5"
        if ics.num_particles["star"][i] == 0:
            ptypes = gamer_ptypes[:-1]
        else:
            ptypes = gamer_ptypes
        write_amr_particles(parts[i], particle_file, ptypes, gamer_ptype_num,
                            in_cgs=True, format="hdf5")
        # suffix-safe naming: the reference's .replace('.h5', ...) is a
        # no-op for names like 'halo.hdf5' and then OVERWRITES the
        # user's source profile via overwrite=True (reference
        # codes.py:115); it also mangles a '.h5' appearing mid-path
        root, ext = os.path.splitext(ics.profiles[i])
        hse_file_gamer = f"{root}_gamer{ext}"
        hses[i].write_model_to_h5(hse_file_gamer, overwrite=True, in_cgs=True,
                                  r_max=ics.r_max[i])
        vel = ics.velocity[i] / units.unit_factor("km/s")
        outlines += [
            f"Merger_File_Prof{i+1}\t\t{hse_file_gamer}\t# profile table of cluster {i+1}",
            f"Merger_File_Par{i+1}\t\t{particle_file}\t# particle file of cluster {i+1}",
            f"Merger_Coll_PosX{i+1}\t\t{ics.center[i][0]}\t# X-center of cluster {i+1} in kpc",
            f"Merger_Coll_PosY{i+1}\t\t{ics.center[i][1]}\t# Y-center of cluster {i+1} in kpc",
            f"Merger_Coll_VelX{i+1}\t\t{vel[0]}\t# X-velocity of cluster {i+1} in km/s",
            f"Merger_Coll_VelY{i+1}\t\t{vel[1]}\t# Y-velocity of cluster {i+1} in km/s",
        ]
    mylog.info("Write the following lines to Input__TestProblem: ")
    for line in outlines:
        print(line)
    if ics.mag_file is not None:
        mylog.info(
            "Rename the file '%s' to 'B_IC' and place it in the same "
            "directory as the Input__* files, and set "
            "OPT__INIT_BFIELD_BYFILE to 1 in Input__Parameter", ics.mag_file)
    return outlines


def setup_flash_ics(ics, use_particles=True, regenerate_particles=False):
    """flash.par lines for the FLASH GalaxyClusterMerger setup
    (codes.py:140-177)."""
    if use_particles:
        ics._generate_particles(regenerate_particles=regenerate_particles)
    outlines = [f"testSingleCluster\t=\t{ics.num_halos} # number of halos"]
    for i in range(ics.num_halos):
        vel = ics.velocity[i] / units.unit_factor("km/s")
        outlines += [
            f"profile{i+1}\t=\t{ics.profiles[i]}\t# profile table of cluster {i+1}",
            f"xInit{i+1}\t=\t{ics.center[i][0]}\t# X-center of cluster {i+1} in kpc",
            f"yInit{i+1}\t=\t{ics.center[i][1]}\t# Y-center of cluster {i+1} in kpc",
            f"vxInit{i+1}\t=\t{vel[0]}\t# X-velocity of cluster {i+1} in km/s",
            f"vyInit{i+1}\t=\t{vel[1]}\t# Y-velocity of cluster {i+1} in km/s",
        ]
        if use_particles:
            outlines.append(
                f"Merger_File_Par{i+1}\t=\t{ics.particle_files[i]}\t"
                f"# particle file of cluster {i+1}")
    mylog.info("Add the following lines to flash.par: ")
    for line in outlines:
        print(line)
    return outlines


def setup_athena_ics(ics):
    """Athena setup stub, matching the reference's (codes.py:180-187)."""
    mylog.info("Add the following lines to athinput.cluster3d: ")


def setup_enzo_ics(ics):
    """Enzo setup stub (codes.py:190-197)."""


def setup_ramses_ics(ics, regenerate_particles=False):
    """RAMSES merger setup: Fortran-binary profiles + DM particle records +
    Merger_Config.txt (codes.py:200-246)."""
    names = ["Main", "Sub", "Third"]
    config_lines = ["# Merger Dynamics Setting, do not change the general format"]
    hses = [ics.load_model(i) for i in range(ics.num_halos)]
    parts = ics._generate_particles(regenerate_particles=regenerate_particles)
    fields_to_write = ["radius", "density", "pressure"]
    for i in range(ics.num_halos):
        if i > 0:
            config_lines.append("#")
        config_lines += [f"# {names[i]}", "#", "#", f"Halo {i+1}"]
        hses[i].write_model_to_binary(
            f"halo{i+1}_prof.dat", overwrite=True, in_cgs=True,
            r_max=float(np.max(ics.r_max)), fields_to_write=fields_to_write)
        vel = ics.velocity[i] / units.unit_factor("km/s")
        pos = ics.center[i]
        config_lines += [
            f"x_cen[kpc]     ={pos[0]:16.6e}",
            f"y_cen[kpc]     ={pos[1]:16.6e}",
            f"z_cen[kpc]     ={pos[2]:16.6e}",
            f"vx_cen[kms]    ={vel[0]:16.6e}",
            f"vy_cen[kms]    ={vel[1]:16.6e}",
            f"vz_cen[kms]    ={vel[2]:16.6e}",
        ]
        write_amr_particles(parts[i], f"halo{i+1}_part.dat", ["dm"],
                            {"dm": 1}, format="fortran", in_cgs=True)
    mylog.info("Simulation setups saved to Merger_Config.txt.")
    np.savetxt("Merger_Config.txt", config_lines, fmt="%s")
    return config_lines


def setup_arepo_ics(ics, boxsize, nx, ic_file, overwrite=False,
                    regenerate_particles=False, prng=None):
    """Gadget-HDF5 AREPO ICs with a uniform low-density background grid
    filling the box outside the clusters (codes.py:249-291)."""
    fields = {}
    cparts = ics.setup_particle_ics(
        regenerate_particles=regenerate_particles, prng=prng)
    ngrid = nx**3
    dx = boxsize / nx
    le = 0.5 * dx
    re = boxsize - 0.5 * dx
    ax = np.linspace(le, re, nx)
    posg = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                    axis=0).reshape(3, ngrid).T
    rmax2 = ics.r_max**2
    # background cells are those outside EVERY cluster (intersection of the
    # outsides). The reference ORs the per-halo masks (codes.py:264-268),
    # which for multi-halo scenes superimposes background gas throughout
    # each cluster's interior — contradicting its own intent; fixed here
    # like the other documented quirks (docs/migration.md).
    idxs = np.sum((posg - ics.center[0]) ** 2, axis=1) > rmax2[0]
    if ics.num_halos > 1:
        idxs &= np.sum((posg - ics.center[1]) ** 2, axis=1) > rmax2[1]
    if ics.num_halos > 2:
        idxs &= np.sum((posg - ics.center[2]) ** 2, axis=1) > rmax2[2]
    dV = dx**3
    nleft = int(idxs.sum())
    idens = int(np.argmin(cparts["gas", "density"]))
    dens = cparts["gas", "density"][idens] * np.ones(nleft)
    eint = cparts["gas", "thermal_energy"][idens] * np.ones(nleft)
    fields["gas", "particle_position"] = posg[idxs, :]
    fields["gas", "particle_velocity"] = np.zeros((nleft, 3))
    fields["gas", "particle_mass"] = dens * dV
    fields["gas", "density"] = dens
    fields["gas", "thermal_energy"] = eint
    mylog.info("Background cell density is %g g/cm**3.",
               dens[0] * units.galactic_to_cgs_factor("density"))
    mylog.info("Background cell mass is %g Msun.", (dens * dV)[0])
    all_parts = cparts + ClusterParticles.from_fields(fields)
    all_parts.write_to_gadget_file(ic_file, boxsize, overwrite=overwrite,
                                   code="arepo")
    return all_parts


def resample_arepo_ics(ics, infile, outfile, overwrite=False):
    """Resample profiles onto a MESHRELAX'd AREPO snapshot
    (codes.py:293-298)."""
    import h5py

    parts = ClusterParticles.from_gadget_file(infile)
    new_parts = ics.resample_particle_ics(parts)
    with h5py.File(infile, "r") as f:
        boxsize = f["Header"].attrs["BoxSize"]
    new_parts.write_to_gadget_file(outfile, boxsize, overwrite=overwrite)


def setup_gizmo_ics(ics):
    """GIZMO setup stub (codes.py:301-308)."""


def setup_art_ics(ics):
    """ART setup stub (codes.py:311-312)."""
