#!/usr/bin/env python
"""Generate TRUE cross-package golden answers by running the UPSTREAM
`cluster_generator` (at /root/reference) through tests/refshim.

Outputs (committed to the repo):
  tests/answers/reference_model.h5      — the reference's canonical model
      (tests/utils/generators.py:37-104 recipe), written by the
      reference's own write_model_to_h5, including dm_df / star_df.
  tests/answers/reference_particles.h5  — 200k DM particles drawn by the
      reference's VirialEquilibrium.generate_particles (positions by its
      inverse-CDF; speeds by the rejection contract of the absent Cython
      module, reimplemented in numpy in refshim).
  benchmarks/reference_baselines.json   — wall-times of the reference on
      THIS machine's CPU for BASELINE.md configs 1-3 (model build; + DF &
      1e6 velocity draws; full 3-component + B-field + checks), used as
      the vs_baseline denominators by the benchmark harnesses.

Run:  python scripts/generate_reference_answers.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))

from refshim import load_reference  # noqa: E402


def build_reference_model():
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
    m = ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                        stellar_density=0.02 * rhot)
    m.set_magnetic_field_from_beta(100.0, gaussian=True)
    return m


def main():
    import numpy as np

    load_reference()
    answers = os.path.join(ROOT, "tests", "answers")
    benchdir = os.path.join(ROOT, "benchmarks")
    os.makedirs(answers, exist_ok=True)
    os.makedirs(benchdir, exist_ok=True)

    # config 1: gas-only model build (BASELINE.md config 1 is 4096 points;
    # the canonical grid is 1000 — time both)
    t0 = time.time()
    m = build_reference_model()
    t_model_1000 = time.time() - t0

    # config 2: + Eddington inversion and 1e6 velocity samples
    t0 = time.time()
    _ = m.dm_virial  # lazy DF build (1000 adaptive quads)
    t_df = time.time() - t0
    t0 = time.time()
    p1m = m.generate_dm_particles(1_000_000, r_max=5000.0, prng=25)
    t_vel_1e6 = time.time() - t0
    assert (m.dm_virial.df.d >= 0).all()

    # config 3: full three-component + stellar DF + residual checks
    t0 = time.time()
    _ = m.star_virial
    hse = float(np.abs(m.check_hse()).max())
    chk_dm = m.check_dm_virial()[1]
    chk_st = m.check_star_virial()[1]
    t_cfg3_extra = time.time() - t0
    assert hse < 1e-4

    # golden files (reference's own writers)
    model_file = os.path.join(answers, "reference_model.h5")
    part_file = os.path.join(answers, "reference_particles.h5")
    for fn in (model_file, part_file):
        if os.path.exists(fn):
            os.remove(fn)
    m.write_model_to_h5(model_file)
    parts = m.generate_dm_particles(200_000, r_max=5000.0, prng=25)
    parts.write_particles(part_file)

    baselines = {
        "machine": "container CPU (reference run via tests/refshim)",
        "notes": ("cfg2 velocity sampling uses refshim's numpy rejection "
                  "sampler standing in for the absent Cython module "
                  "(vectorized; likely FASTER than the original's "
                  "per-particle C loop — a conservative baseline)"),
        "cfg1_model_build_1000pt_s": round(t_model_1000, 3),
        "cfg2_df_s": round(t_df, 3),
        "cfg2_velocities_1e6_s": round(t_vel_1e6, 3),
        "cfg2_total_s": round(t_model_1000 + t_df + t_vel_1e6, 3),
        "cfg3_total_s": round(t_model_1000 + t_df + t_cfg3_extra, 3),
        "hse_residual": hse,
        "dm_virial_signed_max": float(chk_dm.max()),
        "star_virial_signed_max": float(chk_st.max()),
    }
    with open(os.path.join(benchdir, "reference_baselines.json"), "w") as f:
        json.dump(baselines, f, indent=2)
    print(json.dumps(baselines, indent=2))
    print("wrote", model_file, "and", part_file)


if __name__ == "__main__":
    main()
