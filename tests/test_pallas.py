"""Pallas kernels (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cluster_generator_tpu.ops.pallas_kernels import (
    invert_cdf_rows,
    invert_cdf_rows_reference,
)


@pytest.mark.parametrize("n_s,n_q", [(256, 128), (1024, 512)])
def test_invert_cdf_rows_matches_reference(n_s, n_q):
    rng = np.random.RandomState(0)
    N = 17  # exercises row padding (17 % 8 != 0)
    pdf = rng.rand(N, n_s - 1) + 0.05
    cdf = np.concatenate([np.zeros((N, 1)), np.cumsum(pdf, axis=1)], axis=1)
    cdf /= cdf[:, -1:]
    ref = np.asarray(invert_cdf_rows_reference(jnp.asarray(cdf), n_q=n_q))
    out = np.asarray(invert_cdf_rows(jnp.asarray(cdf), n_q=n_q,
                                     interpret=True))
    assert out.shape == (N, n_q)
    assert np.abs(out - ref).max() < 5e-6


def test_invert_cdf_rows_endpoints():
    c = np.linspace(0, 1, 64)[None, :].repeat(3, axis=0)
    out = np.asarray(invert_cdf_rows(jnp.asarray(c), n_q=33, interpret=True))
    # identity CDF -> identity inverse
    assert np.allclose(out, np.linspace(0, 1, 33)[None, :], atol=1e-6)


def test_speed_table_pallas_route(canonical_model):
    """speed_inverse_cdf_table(use_pallas=True) matches the interp route."""
    import jax.numpy as jnp

    from cluster_generator_tpu.virial import speed_inverse_cdf_table

    v = canonical_model.dm_virial
    ee = jnp.asarray(v.ee)
    ff = jnp.asarray(v.ff)
    a = np.asarray(speed_inverse_cdf_table(ee, ff, table_dtype=jnp.float32))
    b = np.asarray(speed_inverse_cdf_table(ee, ff, table_dtype=jnp.float32,
                                           use_pallas=True))
    assert np.abs(a - b).max() < 5e-6
