#!/usr/bin/env python
"""Catalog consumption benchmark: read_catalog / catalog_batches vs h5py.

Builds a full-species datagen catalog, then measures the host-side
consumption paths a training loop would drive:

* ``read_catalog`` full sweep (raw pread at each dataset's offset),
* the same sweep through plain h5py (H5Dread) for the ratio,
* ``catalog_batches`` with and without the prefetch thread.

All reads are page-cache-warm (each sweep runs twice, the second is
reported): the point is the *software* ceiling of the read path, which
is what repeated training epochs see.  Prints JSON lines like bench.py.

BENCH_SMOKE=1 shrinks the catalog 8x.
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
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax

    if jax.default_backend() != "cpu":
        # catalog IO is host-side; the draws just need to exist
        pass
    import h5py
    import numpy as np

    from cluster_generator_tpu.parallel import (
        catalog_batches,
        ensemble_datagen,
        read_catalog,
        sample_ensemble_params,
    )

    n_cl = 16 if _SMOKE else int(os.environ.get("BENCH_N_CLUSTERS", "128"))
    counts = {"dm": 50_000, "gas": 40_000, "star": 10_000}
    M, c = sample_ensemble_params(jax.random.key(0), n_cl)

    with tempfile.TemporaryDirectory(dir=os.environ.get("BENCH_TMP")) as td:
        fn = os.path.join(td, "catalog.h5")
        t0 = time.time()
        ensemble_datagen(M, c, fn, counts, batch_size=min(32, n_cl),
                         num_points=256)
        build_s = time.time() - t0
        gb = os.path.getsize(fn) / 1e9
        print(f"# catalog: {n_cl} clusters, {gb:.2f} GB, built in "
              f"{build_s:.1f}s (includes device compute)", file=sys.stderr)

        def sweep_raw():
            s = 0.0
            for _, cl in read_catalog(fn):
                s += float(cl["dm_position"][0, 0])
            return s

        def sweep_h5py():
            # like-for-like with read_catalog: datasets AND group attrs
            s = 0.0
            with h5py.File(fn, "r") as f:
                for i in range(n_cl):
                    g = f[f"cluster_{i:06d}"]
                    out = {k: g[k][()] for k in g}
                    out.update(g.attrs)
                    s += float(out["dm_position"][0, 0])
            return s

        def sweep_batches(prefetch):
            n = 0
            # drop_remainder=False so a BENCH_N_CLUSTERS that isn't a
            # multiple of the batch size still sweeps every cluster
            for b in catalog_batches(fn, min(16, n_cl), prefetch=prefetch,
                                     drop_remainder=False):
                n += b["M200"].shape[0]
            assert n == n_cl

        results = {}
        for tag, fnc in (("read_catalog", sweep_raw),
                         ("h5py", sweep_h5py)):
            fnc()  # warm the page cache / h5py metadata
            t0 = time.time()
            fnc()
            dt = time.time() - t0
            results[tag] = dt
            print(f"# {tag} warm sweep: {dt:.2f}s = {gb / dt:.2f} GB/s",
                  file=sys.stderr)
        for tag, pf in (("batches_prefetch", True),
                        ("batches_serial", False)):
            sweep_batches(pf)
            t0 = time.time()
            sweep_batches(pf)
            dt = time.time() - t0
            results[tag] = dt
            print(f"# catalog_batches(prefetch={pf}): {dt:.2f}s = "
                  f"{gb / dt:.2f} GB/s", file=sys.stderr)

    print(json.dumps({
        "metric": "catalog_read_sweep_gbps",
        "value": round(gb / results["read_catalog"], 3),
        "unit": "GB/s",
        "vs_baseline": round(results["h5py"] / results["read_catalog"], 2),
        "gb": round(gb, 3),
        "h5py_gbps": round(gb / results["h5py"], 3),
        "batches_prefetch_gbps": round(gb / results["batches_prefetch"], 3),
        "batches_serial_gbps": round(gb / results["batches_serial"], 3),
    }))


if __name__ == "__main__":
    main()
