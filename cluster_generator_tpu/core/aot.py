"""AOT persistence of compiled XLA executables.

The persistent *compilation cache* (``.jax_cache/``) removes XLA's
compile time but a fresh process still pays tracing + lowering + cache
lookup (~17 s for the deep fused headline program, docs/performance.md).
This module serializes the compiled executable itself
(``jax.experimental.serialize_executable``): loading deserializes the
PjRt executable directly — no tracing, no lowering, no compile — so the
first IC of a fresh process costs deserialization + run.

Artifacts are keyed on (jax version, backend platform, package source
digest, donated/static shape signature) — a stale or cross-backend
artifact fails loudly at deserialization, so ``load_compiled`` returns
``None`` on ANY failure and callers fall back to the jit path.

The source digest (sha256 over every ``.py`` file in the package,
:func:`source_digest`) makes staleness self-detecting: editing any
product code changes the artifact filename, so a fresh process simply
misses the old artifact and falls back to jit + the persistent cache
instead of silently running the program the artifact was compiled
from.  Re-prime (``python bench.py --prime-aot``) at the new HEAD to
restore the AOT fast path.

Measured tradeoff on the axon-tunneled v5e (r4_batch{2,3}.log): AOT
12.8 s first-IC with a warm artifact (6.1 s deserialize + 6.7 s first
dispatch) vs 15.9 s for jit + primed persistent cache; the FIRST
deserialize of a 244 MB artifact costs 29.7 s (server-cached after).
"""

from __future__ import annotations

import os
import pickle

import jax

__all__ = ["save_compiled", "load_compiled", "artifact_path",
           "source_digest", "prune_stale"]

_MAGIC = b"CGTPU-AOT-1\n"

_digest_cache = {}


def source_digest(root=None):
    """Short sha256 digest over every ``.py`` file under ``root``
    (default: this package).  Any source edit changes the digest, so
    artifacts keyed on it self-invalidate — the stale file is simply
    never found again (vs silently executing the old program)."""
    import hashlib
    import pathlib

    if root is None:
        root = pathlib.Path(__file__).resolve().parents[1]
    root = pathlib.Path(root)
    key = str(root)
    if key in _digest_cache:
        return _digest_cache[key]
    h = hashlib.sha256()
    for p in sorted(root.rglob("*.py")):
        h.update(p.relative_to(root).as_posix().encode())
        h.update(b"\0")
        h.update(p.read_bytes())
    digest = h.hexdigest()[:10]
    _digest_cache[key] = digest
    return digest


def artifact_path(directory, name):
    """Stable artifact filename keyed on (jax version, default backend,
    package source digest)."""
    backend = jax.default_backend()
    return os.path.join(
        directory,
        f"{name}-{jax.__version__}-{backend}-{source_digest()}.aotx")


def prune_stale(directory, name):
    """Delete ``name``'s artifacts whose key can never match
    :func:`artifact_path` again (old digest or old jax version).  Stale
    files can never load — the lookup is by filename — so they are
    pure dead weight (the headline artifact is ~244 MB).  Artifacts for
    a DIFFERENT backend under the current jax version AND current
    source digest are kept: during a TPU outage jax initializes on the
    CPU fallback, and pruning then must not delete the still-loadable
    (and ~1.5 h to rebuild) TPU artifact.  An other-backend artifact
    with a DEAD digest is pruned like any other — the digest is
    backend-independent, so no backend can ever load it again.
    Returns the removed paths."""
    import glob

    keep = os.path.abspath(artifact_path(directory, name))
    removed = []
    for p in glob.glob(os.path.join(directory, f"{name}-*.aotx")):
        if os.path.abspath(p) == keep:
            continue
        # filename layout: {name}-{ver}-{backend}-{digest}.aotx; rsplit
        # keeps a dashed version string intact
        rest = os.path.basename(p)[len(name) + 1:-len(".aotx")]
        parts = rest.rsplit("-", 2)
        if (len(parts) == 3 and parts[0] == jax.__version__
                and parts[1] != jax.default_backend()
                and parts[2] == source_digest()):
            continue  # other backend, current jax + digest: loadable
        os.remove(p)
        removed.append(p)
    return removed


def save_compiled(jitted_fn, args, path):
    """Lower + compile ``jitted_fn`` at ``args`` and persist the
    executable.  Returns the compiled function (usable immediately).

    Warns when priming on a multi-device client: ``load_compiled``
    only accepts single-device artifacts (see the load-side comment),
    so a mesh-primed artifact would be dead weight."""
    import warnings

    from jax.experimental.serialize_executable import serialize

    if jax.local_device_count() != 1:
        warnings.warn(
            f"save_compiled on a {jax.local_device_count()}-device "
            "client: load_compiled only loads single-device artifacts, "
            "so this artifact will never be used", stacklevel=2)

    compiled = jitted_fn.lower(*args).compile()
    payload = serialize(compiled)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        # deserialize_and_load binds the executable to the client's FULL
        # local device set; record the save-time count so a mismatched
        # load (e.g. an artifact saved single-chip, loaded under a forced
        # 8-device virtual mesh) falls back instead of failing at call
        pickle.dump({"n_devices": jax.local_device_count(),
                     "payload": payload}, f)
    os.replace(tmp, path)
    return compiled


def load_compiled(path):
    """Deserialize a persisted executable; ``None`` if missing/stale/
    incompatible (callers fall back to jit + persistent cache)."""
    from jax.experimental.serialize_executable import deserialize_and_load

    try:
        with open(path, "rb") as f:
            if f.read(len(_MAGIC)) != _MAGIC:
                return None
            record = pickle.load(f)
        # deserialize_and_load binds the executable to the client's FULL
        # local device set (a 1-device-placed program deserialized under
        # an 8-device client demands 8-shard inputs and fails at call
        # time), so the facility is restricted to the product path:
        # single-device client loading a single-device artifact.
        if record["n_devices"] != 1 or jax.local_device_count() != 1:
            return None
        serialized, in_tree, out_tree = record["payload"]
        return deserialize_and_load(serialized, in_tree, out_tree)
    except Exception:
        return None
