#!/usr/bin/env python
"""Measure additional reference baselines on this machine's CPU and merge
them into benchmarks/reference_baselines.json:

  cfg1_model_build_4096pt_s — BASELINE config 1 at its stated 4096-point grid
  field_512_s               — RandomMagneticField on a 512^3 grid (the
                              reference's numpy FFT + div-clean path)

Run:  python benchmarks/measure_reference_extra.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))

from refshim import load_reference  # noqa: E402


def main():
    load_reference()
    from cluster_generator.model import ClusterModel
    from cluster_generator.radial_profiles import (
        find_overdensity_radius,
        find_radius_mass,
        rescale_profile_by_mass,
        snfw_density_profile,
        snfw_mass_profile,
        snfw_total_mass,
        vikhlinin_density_profile,
    )

    z, M200, conc, f_g = 0.1, 1.5e15, 4.0, 0.12
    r200 = find_overdensity_radius(M200, 200.0, z=z)
    a = r200 / conc
    M = snfw_total_mass(M200, r200, a)
    rhot = snfw_density_profile(M, a)
    Mt = snfw_mass_profile(M, a)
    r500, M500 = find_radius_mass(Mt, z=z, delta=500.0)
    rhog = rescale_profile_by_mass(
        vikhlinin_density_profile(1.0, 100.0, r200, 1.0, 0.67, 3),
        f_g * M500, r500)

    t0 = time.time()
    ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                    stellar_density=0.02 * rhot,
                                    num_points=4096)
    t_4096 = time.time() - t0
    print(f"cfg1 @4096 pts: {t_4096:.2f}s", file=sys.stderr)

    from cluster_generator.fields import RandomMagneticField

    t0 = time.time()
    RandomMagneticField(
        [-1000.0, -1000.0, -1000.0], [1000.0, 1000.0, 1000.0],
        (512, 512, 512), 50.0, 500.0, 1.0e-6, padding=0.0, prng=42)
    t_field = time.time() - t0
    print(f"field 512^3: {t_field:.2f}s", file=sys.stderr)

    path = os.path.join(ROOT, "benchmarks", "reference_baselines.json")
    with open(path) as f:
        data = json.load(f)
    data["cfg1_model_build_4096pt_s"] = round(t_4096, 3)
    data["field_512_s"] = round(t_field, 3)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({"cfg1_model_build_4096pt_s": data[
        "cfg1_model_build_4096pt_s"], "field_512_s": data["field_512_s"]}))


if __name__ == "__main__":
    main()
