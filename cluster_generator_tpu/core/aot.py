"""AOT persistence of compiled XLA executables.

The persistent *compilation cache* (``.jax_cache/``) removes XLA's
compile time but a fresh process still pays tracing + lowering + cache
lookup (~17 s for the deep fused headline program, docs/performance.md).
This module serializes the compiled executable itself
(``jax.experimental.serialize_executable``): loading deserializes the
PjRt executable directly — no tracing, no lowering, no compile — so the
first IC of a fresh process costs deserialization + run.

Staleness design (round-5 rework; VERDICT r4 "what's weak" #3): the
artifact is keyed on the **program fingerprint** — a sha256 over the
lowered StableHLO text + jax version + backend + device count — not on
a whole-package source digest.  The round-4 scheme keyed the filename
on a sha over every ``.py`` in the package, so ANY commit (even to a
module the program never imports) killed a 244 MB artifact that took
~1.5 h to rebuild; r4's own headline artifact died 25 minutes after
priming, before the driver's gate ever ran it.

Because computing the fingerprint needs tracing + lowering (seconds) —
exactly what the fast path must skip — a sidecar map
(``<artifact>.known.json``) caches verified ``source digest ->
fingerprint`` pairs:

* source digest already in the sidecar and equal to the artifact's
  fingerprint -> load directly, zero tracing (the product fast path);
* unknown source digest (fresh commit): lower once, compare
  fingerprints — equal means the commit didn't change the program, so
  the pair is recorded and every later process takes the fast path
  again; different means the program really changed -> fall back to
  jit (and re-prime at leisure);
* no ``jitted_fn`` provided to verify with -> conservative ``None``.

Measured tradeoff on the axon-tunneled v5e (r4_batch{2,3}.log): AOT
12.8 s first-IC with a warm artifact (6.1 s deserialize + 6.7 s first
dispatch) vs 15.9 s for jit + primed persistent cache; the FIRST
deserialize of a 244 MB artifact costs 29.7 s (server-cached after).
"""

from __future__ import annotations

import json
import os
import pickle

import jax

__all__ = ["save_compiled", "load_compiled", "artifact_path",
           "source_digest", "program_fingerprint", "prune_stale"]

_MAGIC = b"CGTPU-AOT-2\n"

_digest_cache = {}


def source_digest(root=None):
    """Short sha256 digest over every ``.py`` file under ``root``
    (default: this package).  Cheap (~ms, memoized); used only as the
    sidecar KEY for verified fingerprints — it no longer keys the
    artifact filename, so a source edit costs one re-lowering, not the
    artifact."""
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


def program_fingerprint(lowered):
    """Fingerprint of a ``jitted_fn.lower(*args)`` result: sha256 over
    the StableHLO text plus jax version, backend, and local device
    count.  Two processes at different commits that lower to the same
    program get the same fingerprint — the property the artifact key
    needs."""
    import hashlib

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(b"\0")
    h.update(jax.default_backend().encode())
    h.update(b"\0")
    h.update(str(jax.local_device_count()).encode())
    h.update(b"\0")
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:12]


def artifact_path(directory, name):
    """Stable artifact filename keyed on (jax version, default backend)
    — NOT on the package source, so commits don't orphan artifacts; the
    program fingerprint stored inside the artifact carries the actual
    staleness key (module docstring)."""
    backend = jax.default_backend()
    return os.path.join(
        directory, f"{name}-{jax.__version__}-{backend}.aotx")


def _sidecar_path(path):
    return path + ".known.json"


def _sidecar_read(path):
    try:
        with open(_sidecar_path(path)) as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except Exception:
        return {}


def _sidecar_record(path, digest, fingerprint):
    d = _sidecar_read(path)
    if d.get(digest) == fingerprint:
        return
    d[digest] = fingerprint
    tmp = f"{_sidecar_path(path)}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=0)
    os.replace(tmp, _sidecar_path(path))


def prune_stale(directory, name):
    """Delete ``name``'s artifacts that can never load again: anything
    in the retired round-4 filename layout
    (``{name}-{ver}-{backend}-{digest}.aotx`` — the load path rejects
    its magic anyway) and current-layout artifacts for another jax
    version.  An artifact for a DIFFERENT backend under the current jax
    version is kept: during a TPU outage jax initializes on the CPU
    fallback, and pruning then must not delete the still-loadable (and
    ~1.5 h to rebuild) TPU artifact.  Orphaned sidecars go with their
    artifacts.  Returns the removed artifact paths."""
    import glob

    keep = os.path.abspath(artifact_path(directory, name))
    removed = []
    for p in glob.glob(os.path.join(directory, f"{name}-*.aotx")):
        if os.path.abspath(p) == keep:
            continue
        rest = os.path.basename(p)[len(name) + 1:-len(".aotx")]
        if rest.startswith(jax.__version__ + "-"):
            # current jax version; the tail after it is the backend in
            # the current layout (backend names never contain a dash —
            # a dashed tail is the retired {backend}-{digest} layout)
            tail = rest[len(jax.__version__) + 1:]
            if tail and "-" not in tail:
                continue  # other backend, still loadable: keep
        os.remove(p)
        if os.path.exists(_sidecar_path(p)):
            os.remove(_sidecar_path(p))
        removed.append(p)
    return removed


def save_compiled(jitted_fn, args, path):
    """Lower + compile ``jitted_fn`` at ``args`` and persist the
    executable, fingerprinted on the lowered program; records the
    current source digest as verified in the sidecar.  Returns the
    compiled function (usable immediately).

    Multi-device clients are allowed (the artifact records its device
    count and only a client with the SAME count may load it — see
    ``load_compiled``)."""
    lowered = jitted_fn.lower(*args)
    fingerprint = program_fingerprint(lowered)
    compiled = lowered.compile()
    from jax.experimental.serialize_executable import serialize

    payload = serialize(compiled)
    try:  # the program's actual device span (may be < client count)
        n_prog = len(compiled._executable.xla_executable.local_devices())
    except Exception:
        n_prog = jax.local_device_count()
    if n_prog != jax.local_device_count():
        import warnings

        warnings.warn(
            f"save_compiled: program spans {n_prog} of the client's "
            f"{jax.local_device_count()} devices; deserialize_and_load "
            "binds executables to the FULL device set, so this artifact "
            "can never load — prime on a client whose device count "
            "matches the program", stacklevel=2)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        # deserialize_and_load binds the executable to the client's FULL
        # local device set; record the save-time counts so a mismatched
        # load (e.g. an artifact saved single-chip, loaded under a forced
        # 8-device virtual mesh) falls back instead of failing at call
        pickle.dump({"n_devices": jax.local_device_count(),
                     "n_program_devices": n_prog,
                     "fingerprint": fingerprint,
                     "payload": payload}, f)
    os.replace(tmp, path)
    _sidecar_record(path, source_digest(), fingerprint)
    return compiled


def load_compiled(path, jitted_fn=None, args=None):
    """Deserialize a persisted executable; ``None`` if missing/stale/
    incompatible (callers fall back to jit + persistent cache).

    Verification ladder (module docstring): sidecar hit -> load with
    zero tracing; sidecar miss + ``jitted_fn``/``args`` given -> lower
    once, load iff the program fingerprint still matches (recording the
    new source digest for next time); otherwise ``None``.
    """
    from jax.experimental.serialize_executable import deserialize_and_load

    try:
        with open(path, "rb") as f:
            if f.read(len(_MAGIC)) != _MAGIC:
                return None
            record = pickle.load(f)
        # deserialize_and_load binds the executable to the client's FULL
        # local device set (a 1-device-placed program deserialized under
        # an 8-device client demands 8-shard inputs and fails at call
        # time) — only a client with the artifact's device count loads,
        # and only when the program spanned that whole client at save
        # (a partial-span program would rebind wrong the same way).
        if record["n_devices"] != jax.local_device_count():
            return None
        if record.get("n_program_devices",
                      record["n_devices"]) != record["n_devices"]:
            return None
        fingerprint = record.get("fingerprint")
        if not fingerprint:
            return None  # pre-fingerprint artifact: never trust blindly
        if _sidecar_read(path).get(source_digest()) != fingerprint:
            if jitted_fn is None or args is None:
                return None
            if program_fingerprint(jitted_fn.lower(*args)) != fingerprint:
                return None  # the program really changed
            _sidecar_record(path, source_digest(), fingerprint)
        serialized, in_tree, out_tree = record["payload"]
        return deserialize_and_load(serialized, in_tree, out_tree)
    except Exception:
        return None
