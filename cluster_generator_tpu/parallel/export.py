"""Per-host sharded particle export.

The multi-chip pipeline (:func:`~cluster_generator_tpu.pipeline
.sample_merger_ic_sharded`) leaves every particle array sharded along the
mesh's particle axis.  Exporting that through a single file would funnel
the whole IC through one host; instead we write a standard multi-file
Gadget snapshot (``NumFilesPerSnapshot = n_shards``, reference
particles.py:475-552 header semantics) with one file per shard.  Each
process writes only its *addressable* shards, while all SNAPSHOT-GLOBAL
metadata is derived in ways every process agrees on without host-side
communication:

* shard file numbers and ``NumFilesPerSnapshot`` come from the array's
  *global* sharding map (``devices_indices_map`` covers non-addressable
  devices too);
* per-shard in-box particle counts — hence ``NumPart_Total`` and the
  globally-unique ``ParticleIDs`` offsets — come from ONE tiny jitted
  ``shard_map`` whose ``all_gather``/replicated output is identical on
  every process (collectives ride ICI/DCN, not the filesystem).

On a single host (or the virtual CPU mesh) the same code writes all the
shard files.  Read back with
``ClusterParticles.from_gadget_files(base + ".0.h5")``.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import numpy as np

__all__ = ["shard_particles", "write_sharded_gadget_files"]

# pipeline-dict field name -> ClusterParticles container field name
_PIPE_TO_CONTAINER = {"particle_potential": "potential_energy"}


def _global_shard_ranks(arr):
    """(rank_by_start, n_shards) for the GLOBAL particle-axis partition of
    ``arr`` — including slices held only by other processes' devices."""
    try:
        index_map = arr.sharding.devices_indices_map(arr.shape)
    except (AttributeError, TypeError):
        return {0: 0}, 1
    starts = sorted({(idx[0].start or 0) for idx in index_map.values()})
    return {start: rank for rank, start in enumerate(starts)}, len(starts)


def shard_particles(parts: dict):
    """Split a dict of sharded device arrays into per-shard
    ``ClusterParticles`` containers.

    ``parts`` is the output of ``sample_merger_ic_sharded`` — every value a
    ``jax.Array`` sharded along axis 0.  Yields ``(global_shard_rank,
    ClusterParticles)`` for each *addressable* shard of this process, in
    rank order; on a multi-host pod each process yields only its own
    shards, with ranks consistent across processes.  Only D2H copies of
    local shards happen; nothing is gathered.
    """
    from ..particles import ClusterParticles

    per_shard: dict[int, dict] = {}
    for key in parts:
        arr = parts[key]
        key_ranks, _ = _global_shard_ranks(arr)
        # unique slices only: an array replicated over other mesh axes has
        # one addressable shard per device, but replicas carry the same
        # index — one file per distinct particle-axis slice
        unique = {}
        for s in arr.addressable_shards:
            unique.setdefault(s.index[0].start or 0, s)
        for start, s in unique.items():
            rank = key_ranks[start]
            ptype, fname = key
            fname = _PIPE_TO_CONTAINER.get(fname, fname)
            per_shard.setdefault(rank, {})[ptype, fname] = np.asarray(s.data)
    for rank in sorted(per_shard):
        fields = per_shard[rank]
        ptypes = []
        for ptype, _ in fields:
            if ptype not in ptypes:
                ptypes.append(ptype)
        yield rank, ClusterParticles(ptypes, fields)


def _global_inbox_counts(parts: dict, box_size, center_offset):
    """Per-shard in-box counts for every species, identical on every
    process: dict ptype -> int64[n_shards].

    One jitted ``shard_map`` per species: each shard counts its particles
    that survive the Gadget box clip (the same predicate
    ``ClusterParticles._clip_to_box`` applies at write time), and
    ``lax.all_gather`` replicates the per-shard counts so the result is
    fully addressable everywhere.  Returns None when the arrays carry no
    mesh (single-device case) — the caller falls back to local counting.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    first = next(iter(parts.values()))
    if not isinstance(first.sharding, NamedSharding):
        return None
    mesh = first.sharding.mesh
    axis = first.sharding.spec[0]
    if axis is None:
        return None
    off = np.zeros(3) if center_offset is None else np.asarray(
        center_offset, dtype=np.float64)

    counts = {}
    for (ptype, fname), arr in parts.items():
        if fname != "particle_position":
            continue

        @partial(jax.shard_map, mesh=mesh, in_specs=P(axis),
                 out_specs=P(), check_vma=False)
        def _count(pos):
            p = pos.astype(jnp.float64) + off
            inb = ~jnp.logical_or((p < 0.0).any(axis=1),
                                  (p > box_size).any(axis=1))
            return jax.lax.all_gather(jnp.sum(inb), axis)

        with mesh:
            counts[ptype] = np.asarray(jax.jit(_count)(arr))
    return counts


def write_sharded_gadget_files(parts: dict, box_size, base_filename,
                               dtype="float32", overwrite=False, code=None,
                               center_offset=None):
    """Write sharded pipeline output as a multi-file Gadget snapshot.

    Produces ``{base}.{k}.h5`` for every addressable shard ``k`` of this
    process; across a multi-host pod the union of all processes' files is
    one consistent snapshot — ``NumFilesPerSnapshot`` equals the global
    shard count, ``NumPart_Total`` the global post-clip totals, and
    ``ParticleIDs`` are globally unique (see the module docstring for how
    the global metadata is derived without host-side communication).

    ``center_offset``: pipeline draws are centered on the merger frame;
    pass an offset (e.g. ``box_size/2``) to shift positions into the
    [0, box_size] Gadget box.  Returns the list of files this process
    wrote.
    """
    base = Path(base_filename)
    _, n_files = _global_shard_ranks(next(iter(parts.values())))
    global_counts = _global_inbox_counts(parts, box_size, center_offset)

    # species order must match write_to_gadget_file's per-file ID
    # accumulation (the container's particle_types insertion order)
    species_order = []
    for ptype, _ in parts:
        if ptype not in species_order:
            species_order.append(ptype)

    def id_offset_for(rank):
        if global_counts is None:
            return 0
        return int(sum(int(global_counts[p][k])
                       for k in range(rank)
                       for p in species_order if p in global_counts))

    slot = {"gas": 0, "dm": 1, "tracer": 2, "star": 4, "black_hole": 5}
    npart_total = None
    if global_counts is not None:
        npart_total = np.zeros(6, dtype="uint32")
        for p, c in global_counts.items():
            npart_total[slot[p]] = int(c.sum())

    written = []
    local = []
    for rank, sp in shard_particles(parts):
        if center_offset is not None:
            off = np.asarray(center_offset, dtype=np.float64)
            for ptype in sp.particle_types:
                sp.fields[ptype, "particle_position"] = (
                    sp.fields[ptype, "particle_position"] + off)
        fn = base.parent / f"{base.name}.{rank}.h5"
        num = sp.write_to_gadget_file(fn, box_size, dtype=dtype,
                                      overwrite=overwrite, code=code,
                                      num_files=n_files, file_num=rank,
                                      id_offset=id_offset_for(rank),
                                      npart_total=npart_total)
        if global_counts is not None:
            for p, n in num.items():
                if n != int(global_counts[p][rank]):
                    raise RuntimeError(
                        f"shard {rank} wrote {n} {p} particles but the "
                        f"collective count saw {int(global_counts[p][rank])}"
                        " — snapshot headers would be inconsistent")
        local.append(num)
        written.append(fn)

    if npart_total is None:
        # single-device fallback: totals are local knowledge
        import h5py

        total = np.zeros(6, dtype="uint32")
        for num in local:
            for p, n in num.items():
                total[slot[p]] += n
        for fn in written:
            with h5py.File(fn, "a") as f:
                f["Header"].attrs["NumPart_Total"] = total
    return written
