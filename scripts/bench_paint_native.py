#!/usr/bin/env python
"""Microbench of the native radial chunk painter (host path).

Paints a 256^3 grid (64 chunks of 64^3) from a 512-knot log-spaced
spline — 1/32nd of the 512^3 x 8 field "disk as VRAM" workload — and
prints cells/s, so painter changes can be validated on the 1-core host
without the 2-minute full run.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

from cluster_generator_tpu.ops import native
from cluster_generator_tpu.core.interp import cubic_spline


def main():
    assert native.available(), "native library failed to build"
    n = 512
    xs = np.geomspace(1.0, 10_000.0, n)
    sp = cubic_spline(xs, np.log(xs))
    dim, cs = 256, 64
    nc = dim // cs
    starts = np.array([(i * cs, j * cs, k * cs)
                       for i in range(nc) for j in range(nc)
                       for k in range(nc)], dtype=np.int64)
    deltas = np.full(3, 10_000.0 / dim)
    left = np.full(3, -5_000.0)
    # warm-up (page in out buffer)
    out = native.paint_radial_chunks(sp, starts, cs, deltas, left)
    times = []
    for _ in range(3):
        t0 = time.time()
        out = native.paint_radial_chunks(sp, starts, cs, deltas, left)
        times.append(time.time() - t0)
    med = sorted(times)[1]
    cells = dim**3
    print(f"checksum {float(out.sum()):.6e}")
    print(f"median {med:.3f}s  {cells / med / 1e6:.1f} Mcells/s  "
          f"(512^3 x 8 fields extrapolates to {64 * med:.1f}s paint)")


if __name__ == "__main__":
    main()
