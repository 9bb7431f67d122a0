"""Train an emulator on an ensemble-datagen catalog — the consumption
loop the catalog product is built for.

The pipeline: `ensemble_datagen` streams full-species cluster draws to
one HDF5 catalog; `catalog_batches` feeds shuffled, fixed-shape training
batches (prefetched on a background thread, `fields=` subsetting so the
loop only pays for the arrays it uses); a jitted optax step trains an
MLP mapping (M200, conc) to the clusters' radial velocity-dispersion
profile measured from the drawn DM particles.  One jit shape for the
whole run (`drop_remainder=True`), host reads overlapping device
compute — the same overlap discipline the writer uses.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

try:
    import optax
except ImportError as e:  # optional extra, not a core dependency
    raise SystemExit(
        "this example needs optax (pip install "
        "cluster-generator-tpu[examples])") from e

from cluster_generator_tpu.parallel import (
    catalog_batches,
    ensemble_datagen,
    sample_ensemble_params,
)

SCALE = float(os.environ.get("CG_EXAMPLE_SCALE", "1"))
N_CL = max(12, int(256 / SCALE))
N_DM = max(2_000, int(50_000 / SCALE))
BATCH = 4
EDGES = jnp.asarray([50.0, 200.0, 500.0, 1000.0, 2000.0])  # kpc
K = EDGES.shape[0] - 1

# ---------------------------------------------------------------- catalog
M200, conc = sample_ensemble_params(jax.random.key(0), N_CL)
fn = os.path.join(tempfile.mkdtemp(), "train_catalog.h5")
ensemble_datagen(M200, conc, fn, {"dm": N_DM, "gas": 0, "star": 0},
                 batch_size=min(64, N_CL), num_points=256,
                 key=jax.random.key(1))
print(f"catalog: {N_CL} clusters x {N_DM} DM particles -> {fn}")


# ------------------------------------------------------- targets + model
def sigma_profile(pos, vel):
    """Radial velocity-dispersion profile (one cluster): sigma_r in
    fixed radial bins, kpc/Myr."""
    r = jnp.sqrt((pos.astype(jnp.float32) ** 2).sum(axis=1))
    v2 = (vel.astype(jnp.float32) ** 2).sum(axis=1)
    idx = jnp.clip(jnp.searchsorted(EDGES, r) - 1, 0, K - 1)
    in_range = (r >= EDGES[0]) & (r < EDGES[-1])
    w = jnp.where(in_range, 1.0, 0.0)
    cnt = jnp.zeros(K).at[idx].add(w)
    s2 = jnp.zeros(K).at[idx].add(w * v2)
    return jnp.sqrt(s2 / jnp.maximum(cnt, 1.0) / 3.0)


def init_mlp(key, sizes=(2, 64, 64, K)):
    params = []
    for kin, kout, k in zip(sizes[:-1], sizes[1:],
                            jax.random.split(key, len(sizes) - 1)):
        params.append((jax.random.normal(k, (kin, kout)) / jnp.sqrt(kin),
                       jnp.zeros(kout)))
    return params


def mlp(params, x):
    for W, b in params[:-1]:
        x = jax.nn.gelu(x @ W + b)
    W, b = params[-1]
    return x @ W + b


def features(m200, c):
    return jnp.stack([jnp.log10(m200.astype(jnp.float32)) - 15.0,
                      c.astype(jnp.float32) / 5.0], axis=1)


opt = optax.adam(3e-3)


@jax.jit
def train_step(params, opt_state, m200, c, pos, vel):
    target = jax.vmap(sigma_profile)(pos, vel)

    def loss_fn(p):
        pred = mlp(p, features(m200, c))
        return jnp.mean((pred - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss


# --------------------------------------------------------------- training
params = init_mlp(jax.random.key(2))
opt_state = opt.init(params)
first = last = None
for epoch in range(8):
    losses = []
    for b in catalog_batches(fn, BATCH, key=jax.random.key(10 + epoch),
                             fields=["dm_position", "dm_velocity"]):
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(b["M200"]),
            jnp.asarray(b["conc"]), jnp.asarray(b["dm_position"]),
            jnp.asarray(b["dm_velocity"]))
        losses.append(float(loss))
    mean = float(np.mean(losses))
    first = mean if first is None else first
    last = mean
    print(f"epoch {epoch}: loss {mean:.5f}")

print(f"loss {first:.5f} -> {last:.5f} "
      f"({'improved' if last < first else 'NOT improved'})")
assert last < first, "training loss did not improve"
