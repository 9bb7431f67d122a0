#!/usr/bin/env python
"""The "disk as VRAM" grid-build benchmark (VERDICT r3 item 2): 512^3 x 8
fields painted chunk-by-chunk to the YTHDF5 chunked HDF5 layout
(reference data_structures.py:145-251, model.py:1150-1168).

Reports the end-to-end ``add_model`` wall time plus the paint / write
split (paint-only forces every device batch without touching disk;
write-only streams cached blocks), so the overlap win and the remaining
bound are attributable.  JSON lines like bench.py.

    python benchmarks/bench_ythdf5.py [device|native] [f8|f4]

BENCH_SMOKE=1 runs 128^3.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_SMOKE = os.environ.get("BENCH_SMOKE") == "1"


def main():
    engine = sys.argv[1] if len(sys.argv) > 1 else "device"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "f8"
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import cluster_generator_tpu as cg
    from cluster_generator_tpu.data_structures import YTHDF5, _paint_chunk
    from cluster_generator_tpu.core.interp import cubic_spline
    from cluster_generator_tpu.parallel.ensemble import build_one_cluster

    dim = 128 if _SMOKE else 512
    cs = 64
    fields = jax.jit(lambda m, c: build_one_cluster(
        m, c, num_points=1000, with_df=False))(1.5e15, 4.0)
    model = cg.ClusterModel.from_arrays(
        {k: np.asarray(v) for k, v in fields.items()})
    model.set_magnetic_field_from_beta(100.0)
    n_fields = 8  # density, dm, stellar, pressure, 3 momentum, B pressure
    itemsize = {"f8": 8, "f4": 4}[dtype]
    gb = dim**3 * itemsize * n_fields / 1e9

    with tempfile.TemporaryDirectory() as td:
        fn = os.path.join(td, "grid.h5")
        ds = YTHDF5.build(fn, dtype=dtype, domain_dimensions=(dim,) * 3,
                          bbox=np.array([[-5000.0, 5000.0]] * 3),
                          chunksize=cs)

        # --- paint-only: force every batch on device, no disk
        sp = cubic_spline(jnp.asarray(model["radius"]),
                          jnp.asarray(model["density"]))
        starts = ds.chunkmap[:, 0, :].T.astype(np.float64)
        deltas = np.full(3, 10000.0 / dim)
        left = np.full(3, -5000.0)
        paint = jax.vmap(lambda s: _paint_chunk(
            sp, s, jnp.asarray(deltas), jnp.asarray(left), cs))
        batch = 64

        def paint_all():
            tot = 0.0
            for i0 in range(0, starts.shape[0], batch):
                blocks = paint(jnp.asarray(starts[i0:i0 + batch]))
                tot += float(jnp.sum(blocks[-1, -1, -1, -2:]))
            return tot

        paint_all()  # compile
        t0 = time.time()
        paint_all()
        paint_s = time.time() - t0
        print(f"# paint-only (1 field, {starts.shape[0]} chunks, device "
              f"engine): {paint_s:.2f}s", file=sys.stderr)

        if engine == "native":
            # the native path's own paint split (hint-walked C++ painter)
            from cluster_generator_tpu.ops import native

            istarts = starts.astype(np.int64)
            buf = np.empty((batch, cs, cs, cs), dtype=np.float64)
            t0 = time.time()
            for i0 in range(0, istarts.shape[0], batch):
                sb = istarts[i0:i0 + batch]
                b = buf if sb.shape[0] == batch else None
                native.paint_radial_chunks(sp, sb, cs, deltas, left, out=b)
            paint_s = time.time() - t0
            print(f"# paint-only (1 field, native engine): "
                  f"{paint_s:.2f}s", file=sys.stderr)

        # --- write-only: stream one cached batch's worth repeatedly
        blk = np.asarray(paint(jnp.asarray(starts[:batch])))
        with __import__("h5py").File(fn, "a") as fo:
            dset = fo["grid"]["density"]
            t0 = time.time()
            for i0 in range(0, starts.shape[0], batch):
                nb = min(batch, starts.shape[0] - i0)
                dset[i0:i0 + nb, ...] = blk[:nb]
            fo.flush()
        write_s = time.time() - t0
        print(f"# write-only (1 field assign): {write_s:.2f}s",
              file=sys.stderr)

        # --- end-to-end add_model (8 fields, overlapped); sync before so
        # prior writeback backlog doesn't throttle us, and report the
        # durable (sync-inclusive) time alongside the wall time
        os.sync()
        t0 = time.time()
        ds.add_model(model, np.zeros(3), np.array([100.0, 0.0, 0.0]),
                     engine=engine)
        total_s = time.time() - t0
        os.sync()
        durable_s = time.time() - t0

    print(json.dumps({
        "metric": f"ythdf5_{dim}_add_model_wall_time",
        "value": round(total_s, 2), "unit": "s",
        "vs_baseline": None,
        "engine": engine,
        "dtype": dtype,
        "gb_written": round(gb, 2),
        "gb_per_s": round(gb / total_s, 3),
        "durable_s": round(durable_s, 2),
        "paint_1field_s": round(paint_s, 2),
        "write_1field_s": round(write_s, 2),
    }))


if __name__ == "__main__":
    main()
