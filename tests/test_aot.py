"""AOT executable persistence (core/aot.py; VERDICT r3 item 5)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cluster_generator_tpu.core.aot import (
    artifact_path,
    load_compiled,
    save_compiled,
    source_digest,
)


def test_source_digest_keys_artifacts(tmp_path):
    """Artifacts are keyed on a digest of the package source: editing
    any .py file changes the digest (so a stale artifact is simply
    never found and the caller falls back to jit), while non-source
    files are ignored.  STATUS r4 flagged the un-keyed artifact as a
    silent-staleness wart; this pins the fix."""
    pkg = tmp_path / "fakepkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "sub" / "b.py").write_text("y = 2\n")
    d0 = source_digest(pkg)
    assert len(d0) == 10
    # stable across calls (memoized)
    assert source_digest(pkg) == d0
    # non-.py files don't participate
    (pkg / "notes.md").write_text("irrelevant\n")
    from cluster_generator_tpu.core import aot as _aot
    _aot._digest_cache.clear()
    assert source_digest(pkg) == d0
    # editing source changes the digest
    (pkg / "a.py").write_text("x = 999\n")
    _aot._digest_cache.clear()
    d1 = source_digest(pkg)
    assert d1 != d0
    # and the artifact filename carries the package digest
    assert source_digest() in os.path.basename(
        artifact_path(str(tmp_path), "toy"))


def test_prune_stale_removes_only_mismatched_keys(tmp_path):
    """prune_stale deletes artifacts whose filename key (digest/jax
    version/backend) no longer matches, keeps the current one, and
    leaves other names alone."""
    from cluster_generator_tpu.core.aot import prune_stale

    from cluster_generator_tpu.core.aot import source_digest

    cur = artifact_path(str(tmp_path), "toy")
    stale = str(tmp_path / "toy-0.0.1-cpu-0123456789.aotx")
    other = str(tmp_path / "other-0.0.1-cpu-0123456789.aotx")
    # same jax version + CURRENT digest, OTHER backend: still loadable
    # once that backend is back (the TPU-outage-priming-on-CPU
    # scenario) — must survive
    other_backend = str(
        tmp_path / f"toy-{jax.__version__}-notabackend-"
        f"{source_digest()}.aotx")
    # other backend but a DEAD digest: the digest is backend-independent,
    # so no backend can ever load it — pruned
    dead_digest_other_backend = str(
        tmp_path / f"toy-{jax.__version__}-notabackend-abcdef0123.aotx")
    # other backend but an OLD jax version: dead either way
    old_ver_other_backend = str(tmp_path / "toy-0.0.1-notabackend-ff.aotx")
    for p in (cur, stale, other, other_backend,
              dead_digest_other_backend, old_ver_other_backend):
        with open(p, "wb") as f:
            f.write(b"x")
    removed = prune_stale(str(tmp_path), "toy")
    assert sorted(removed) == sorted([stale, dead_digest_other_backend,
                                      old_ver_other_backend])
    assert os.path.exists(cur) and os.path.exists(other)
    assert os.path.exists(other_backend)
    assert not os.path.exists(stale)


def test_multi_device_guard_and_corrupt_artifacts(tmp_path):
    """deserialize_and_load binds the executable to the client's FULL
    local device set, so under the 8-device test mesh the loader must
    refuse (None -> jit fallback) BEFORE the call-time shard-count
    failure.  Missing/corrupt artifacts also return None; saving and
    calling the returned compiled function still works."""
    assert jax.local_device_count() > 1  # the conftest 8-device mesh
    fn = jax.jit(lambda x: jnp.sin(x) * 2.0)
    x = jnp.linspace(0.0, 1.0, 128)
    p = artifact_path(str(tmp_path), "toy")
    assert "cpu" in os.path.basename(p)  # keyed on backend
    compiled = save_compiled(fn, (x,), p)
    np.testing.assert_allclose(np.asarray(compiled(x)),
                               np.sin(np.asarray(x)) * 2.0, rtol=1e-6)
    assert load_compiled(p) is None  # multi-device client -> refuse

    assert load_compiled(p + ".missing") is None
    bad = tmp_path / "bad.aotx"
    bad.write_bytes(b"not an artifact")
    assert load_compiled(str(bad)) is None


def test_cross_process_save_then_load(tmp_path):
    """A 1-device process saves the executable; a FRESH 1-device process
    deserializes and runs it without recompiling — the product path for
    first-IC latency on a primed repo (bench.py --prime-aot)."""
    p = artifact_path(str(tmp_path), "xproc").replace("-cpu.aotx",
                                                      "-cpu1.aotx")
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
loaded = load_compiled({p!r})
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
