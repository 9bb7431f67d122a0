"""Ensemble cluster generation: thousands of equilibrium models per launch.

This is the capability the reference lacks entirely (SURVEY.md §2.3): the
whole model pipeline (profiles -> HSE fields -> Eddington DF) is a pure
function of the cluster parameters, so it ``vmap``s over a parameter batch
and ``shard_map``s/``jit``s over an (ens,) device-mesh axis, with XLA
inserting the collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.grid import log_radius_grid
from ..model.builders import build_from_dens_and_tden
from ..profiles.library import (
    snfw_density_profile,
    snfw_mass_profile,
    snfw_total_mass,
    vikhlinin_density_profile,
)
from ..profiles.relations import f_gas
from ..profiles.solvers import (
    find_overdensity_radius,
    find_radius_mass,
    mass_within,
)
from ..virial import compute_df

__all__ = ["build_one_cluster", "build_ensemble", "sample_ensemble_params"]


def build_one_cluster(M200, conc, z=0.1, f_g=None, rmin=0.1, rmax=10000.0,
                      num_points=1000, with_df: bool = True):
    """Build the flagship cluster configuration from (M200, c).

    sNFW total profile + Vikhlinin gas rescaled to f_gas(M500) * M500 +
    2% stellar component — the reference test suite's canonical cluster
    (tests/utils/generators.py:37-104) — returning the full HSE field dict
    and (optionally) the dark-matter distribution function.
    """
    r200 = find_overdensity_radius(M200, 200.0, z=z)
    a = r200 / conc
    M = snfw_total_mass(M200, r200, a)
    rhot = snfw_density_profile(M, a)
    Mt = snfw_mass_profile(M, a)
    r500, M500 = find_radius_mass(Mt, z=z, delta=500.0)
    if f_g is None:
        f_g = f_gas(M500)
    rhog = vikhlinin_density_profile(1.0, 100.0, r200, 1.0, 0.67, 3)
    rhog = (f_g * M500 / mass_within(rhog, r500)) * rhog
    rhos = 0.02 * rhot

    rr = log_radius_grid(rmin, rmax, num_points)
    fields = build_from_dens_and_tden(rr, rhog, rhot, stellar_density=rhos)
    if with_df:
        ee = -fields["gravitational_potential"][::-1]
        pden = fields["dark_matter_density"][::-1]
        fields["dm_df"] = compute_df(ee, pden)[::-1]
    return fields


@partial(jax.jit, static_argnames=("num_points", "with_df"))
def build_ensemble(M200, conc, z=0.1, num_points=1000, with_df: bool = True):
    """vmapped batch of clusters: (B,) M200 and conc -> batched field dict.

    jit once per (batch, num_points) shape; shard the inputs over an 'ens'
    mesh axis and XLA runs each shard's batch locally with no communication.
    """
    fn = lambda m, c: build_one_cluster(m, c, z=z, num_points=num_points,
                                        with_df=with_df)
    return jax.vmap(fn)(M200, conc)


def sample_ensemble_params(key, n, logM_range=(14.0, 15.3),
                           conc_range=(3.0, 8.0)):
    """Draw an (M200, conc) ensemble; conc anti-correlates with mass in a
    simple power-law fashion plus scatter (a stand-in c(M) relation)."""
    k1, k2 = jax.random.split(key)
    logM = jax.random.uniform(k1, (n,), minval=logM_range[0],
                              maxval=logM_range[1], dtype=jnp.float64)
    M200 = 10.0**logM
    c_mean = 5.0 * (M200 / 1.0e15) ** (-0.1)
    scatter = jax.random.normal(k2, (n,), dtype=jnp.float64) * 0.3
    conc = jnp.clip(c_mean * jnp.exp(scatter), conc_range[0], conc_range[1])
    return M200, conc
