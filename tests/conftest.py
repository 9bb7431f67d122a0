"""Test configuration: force the real XLA CPU backend with 8 virtual devices.

The environment's ``sitecustomize`` registers a remote-TPU ("axon") backend
and pins ``jax_platforms`` to it at interpreter start.  Tests must run on the
CPU backend (the "fake backend" of SURVEY.md §4) with a virtual 8-device mesh
for the sharding tests, so we override the config *before any backend is
initialized* — jax.config wins over the environment.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_runtest_teardown(item, nextitem):
    """Drop jit/pjit caches at every module boundary.

    The full suite compiles hundreds of XLA programs into one process;
    at round-4/5 HEAD the XLA CPU compiler segfaulted reproducibly
    (4/4 runs) inside ``backend_compile_and_load`` once ~200 tests of
    live executables had accumulated — always at whichever heavy pjit
    compile came next (mesh-sharded datagen at r4; the plain datagen
    stream at r5 after that test moved to a subprocess).  Each test file
    passes in isolation.  Freeing the compiled-executable state between
    modules keeps the per-process live set bounded; the price is
    re-compiling shared builders per module (~1 min extra over the
    suite), which the module-level cache reuse within a file keeps
    acceptable."""
    next_module = getattr(nextitem, "module", None) if nextitem else None
    if getattr(item, "module", None) is not next_module:
        import gc

        jax.clear_caches()
        gc.collect()


def pytest_addoption(parser):
    """Golden-answer options mirroring the reference's conftest
    (conftest.py:140-161)."""
    parser.addoption("--answer_dir", default=None,
                     help="directory holding golden answers")
    parser.addoption("--answer_store", action="store_true", default=False,
                     help="(re)generate golden answers instead of comparing")


@pytest.fixture(scope="session")
def answer_dir(request):
    d = request.config.getoption("--answer_dir")
    if d is None:
        # default to the committed goldens (regression tripwire between
        # rounds); self-skip only if neither exists
        default = os.path.join(os.path.dirname(__file__), "answers")
        if os.path.isdir(default):
            return default
        pytest.skip("no --answer_dir supplied and no committed answers")
    return d


@pytest.fixture(scope="session")
def answer_store(request):
    return request.config.getoption("--answer_store")


@pytest.fixture(scope="session")
def canonical_model():
    """The reference test suite's canonical cluster
    (tests/utils/generators.py:37-104): sNFW total + Vikhlinin gas +
    2% stars, from_dens_and_tden on [0.1, 1e4] kpc, beta=100 B field."""
    import cluster_generator_tpu as cg

    z, M200, conc, f_g = 0.1, 1.5e15, 4.0, 0.12
    r200 = float(cg.find_overdensity_radius(M200, 200.0, z=z))
    a = r200 / conc
    M = float(cg.snfw_total_mass(M200, r200, a))
    rhot = cg.snfw_density_profile(M, a)
    Mt = cg.snfw_mass_profile(M, a)
    r500, M500 = cg.find_radius_mass(Mt, z=z, delta=500.0)
    rhog = cg.vikhlinin_density_profile(1.0, 100.0, r200, 1.0, 0.67, 3)
    rhog = cg.rescale_profile_by_mass(rhog, f_g * float(M500), float(r500))
    rhos = 0.02 * rhot
    m = cg.ClusterModel.from_dens_and_tden(0.1, 10000.0, rhog, rhot,
                                           stellar_density=rhos)
    m.set_magnetic_field_from_beta(100.0, gaussian=True)
    return m


@pytest.fixture(scope="session")
def canonical_profiles():
    import cluster_generator_tpu as cg

    z, M200, conc, f_g = 0.1, 1.5e15, 4.0, 0.12
    r200 = float(cg.find_overdensity_radius(M200, 200.0, z=z))
    a = r200 / conc
    M = float(cg.snfw_total_mass(M200, r200, a))
    rhot = cg.snfw_density_profile(M, a)
    Mt = cg.snfw_mass_profile(M, a)
    r500, M500 = cg.find_radius_mass(Mt, z=z, delta=500.0)
    rhog = cg.vikhlinin_density_profile(1.0, 100.0, r200, 1.0, 0.67, 3)
    rhog = cg.rescale_profile_by_mass(rhog, f_g * float(M500), float(r500))
    rhos = 0.02 * rhot
    return {"rhog": rhog, "rhot": rhot, "rhos": rhos, "r200": r200,
            "r500": float(r500), "M500": float(M500), "M200": M200, "a": a,
            "M": M}
