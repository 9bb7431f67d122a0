"""Per-host sharded particle export.

The multi-chip pipeline (:func:`~cluster_generator_tpu.pipeline
.sample_merger_ic_sharded`) leaves every particle array sharded along the
mesh's particle axis.  Exporting that through a single file would funnel
the whole IC through one host; instead we write a standard multi-file
Gadget snapshot (``NumFilesPerSnapshot = n_shards``, reference
particles.py:475-552 header semantics) with one file per shard.  Each
process writes only its *addressable* shards, so on a real multi-host pod
every host streams its local HBM to its own file and no cross-host
gather ever happens; on a single host (or the virtual CPU mesh) the same
code writes all the shard files.

Read back with ``ClusterParticles.from_gadget_files(base + ".0.h5")``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["shard_particles", "write_sharded_gadget_files"]

# pipeline-dict field name -> ClusterParticles container field name
_PIPE_TO_CONTAINER = {"particle_potential": "potential_energy"}


def shard_particles(parts: dict):
    """Split a dict of sharded device arrays into per-shard
    ``ClusterParticles`` containers.

    ``parts`` is the output of ``sample_merger_ic_sharded`` — every value a
    ``jax.Array`` sharded along axis 0.  Yields ``(shard_index,
    ClusterParticles)`` for each *addressable* shard of this process, in
    shard order.  Only D2H copies of local shards happen; nothing is
    gathered.
    """
    from ..particles import ClusterParticles

    per_shard: dict[int, dict] = {}
    for key in parts:
        arr = parts[key]
        # unique slices only: an array replicated over other mesh axes has
        # one addressable shard per device, but replicas carry the same
        # index — one file per distinct particle-axis slice
        unique = {}
        for s in arr.addressable_shards:
            unique.setdefault(s.index[0].start or 0, s)
        for rank, start in enumerate(sorted(unique)):
            ptype, fname = key
            fname = _PIPE_TO_CONTAINER.get(fname, fname)
            per_shard.setdefault(rank, {})[ptype, fname] = np.asarray(
                unique[start].data)
    for rank in sorted(per_shard):
        fields = per_shard[rank]
        ptypes = []
        for ptype, _ in fields:
            if ptype not in ptypes:
                ptypes.append(ptype)
        yield rank, ClusterParticles(ptypes, fields)


def write_sharded_gadget_files(parts: dict, box_size, base_filename,
                               dtype="float32", overwrite=False, code=None,
                               center_offset=None):
    """Write sharded pipeline output as a multi-file Gadget snapshot.

    Produces ``{base}.{k}.h5`` for every addressable shard ``k`` with
    globally-unique particle IDs and consistent ``NumPart_Total`` headers
    (patched across this process's files once all shard counts are known).
    ``center_offset``: pipeline draws are centered on the merger frame;
    pass an offset (e.g. ``box_size/2``) to shift positions into the
    [0, box_size] Gadget box.  Returns the list of files written.
    """
    import h5py

    base = Path(base_filename)
    shards = list(shard_particles(parts))
    n_files = len(shards)
    written = []
    counts = []
    id_offset = 0
    for rank, sp in shards:
        if center_offset is not None:
            off = np.asarray(center_offset, dtype=np.float64)
            for ptype in sp.particle_types:
                sp.fields[ptype, "particle_position"] = (
                    sp.fields[ptype, "particle_position"] + off)
        fn = base.parent / f"{base.name}.{rank}.h5"
        num = sp.write_to_gadget_file(fn, box_size, dtype=dtype,
                                      overwrite=overwrite, code=code,
                                      num_files=n_files, file_num=rank,
                                      id_offset=id_offset)
        id_offset += sum(num.values())
        counts.append(num)
        written.append(fn)

    # patch global totals now every shard's post-clip count is known
    total = np.zeros(6, dtype="uint32")
    slot = {"gas": 0, "dm": 1, "tracer": 2, "star": 4, "black_hole": 5}
    for num in counts:
        for ptype, n in num.items():
            total[slot[ptype]] += n
    for fn in written:
        with h5py.File(fn, "a") as f:
            f["Header"].attrs["NumPart_Total"] = total
    return written
