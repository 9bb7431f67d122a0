"""Subprocess worker: mesh-sharded ensemble_datagen vs single-device.

Run as ``python mesh_datagen_worker.py <tmpdir>``.  Exists because the
mesh-sharded datagen pjit compile segfaults the XLA CPU compiler when
hundreds of executables from earlier test files are live in the same
process (reproducer: ``pytest tests/ -q`` at round-4 HEAD died 2/2 runs
inside ``backend_compile_and_load`` at this test; the same test passes
in isolation).  A fresh interpreter per compile removes the poisoned
process state deterministically; the physics assertions are unchanged
from the original in-process test.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main(tmpdir):
    from cluster_generator_tpu.parallel import (
        ensemble_datagen,
        make_mesh,
        read_catalog,
        sample_ensemble_params,
    )

    M, c = sample_ensemble_params(jax.random.key(21), 19)  # 8+8+3 batches
    kw = dict(n_particles_per_cluster={"dm": 256, "gas": 192, "star": 64},
              batch_size=8, num_points=128, key=jax.random.key(6))
    single = os.path.join(tmpdir, "single.h5")
    sharded = os.path.join(tmpdir, "sharded.h5")
    ensemble_datagen(M, c, single, **kw)
    mesh = make_mesh()  # all 8 devices on 'ens'
    assert mesh.shape["ens"] == 8
    ensemble_datagen(M, c, sharded, mesh=mesh, **kw)
    ref = dict(read_catalog(single))
    got = dict(read_catalog(sharded))
    assert sorted(got) == sorted(ref)
    for i in ref:
        for k in ref[i]:
            np.testing.assert_allclose(got[i][k], ref[i][k],
                                       rtol=5e-7, atol=1e-6,
                                       err_msg=f"cluster {i} {k}")
    # the final short batch (3 clusters, default placement) is exact
    for i in (16, 17, 18):
        for k in ref[i]:
            np.testing.assert_array_equal(got[i][k], ref[i][k],
                                          err_msg=f"tail cluster {i} {k}")

    # merger-product parity: merger_datagen(mesh=...) matches its
    # single-device run the same way (same ~1 ulp f32 tolerance)
    from cluster_generator_tpu.parallel import (
        merger_datagen,
        read_merger_catalog,
        sample_merger_scene_params,
    )

    p = sample_merger_scene_params(jax.random.key(33), 8)
    mkw = dict(counts={"dm": 64, "gas": 48, "star": 16}, batch_size=8,
               num_points=128, key=jax.random.key(7))
    m_single = os.path.join(tmpdir, "m_single.h5")
    m_shard = os.path.join(tmpdir, "m_sharded.h5")
    merger_datagen(p, m_single, **mkw)
    merger_datagen(p, m_shard, mesh=mesh, **mkw)
    mref = dict(read_merger_catalog(m_single))
    mgot = dict(read_merger_catalog(m_shard))
    assert sorted(mgot) == sorted(mref)
    for i in mref:
        for k in mref[i]:
            np.testing.assert_allclose(mgot[i][k], mref[i][k],
                                       rtol=5e-7, atol=1e-6,
                                       err_msg=f"scene {i} {k}")
    print("MESH_DATAGEN_OK")


if __name__ == "__main__":
    main(sys.argv[1])
