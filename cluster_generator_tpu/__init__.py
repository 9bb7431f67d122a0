"""cluster_generator_tpu — a TPU-native (JAX/XLA/Pallas) galaxy-cluster
initial-conditions engine.

Ground-up rebuild of the capabilities of ``Eliza-Diggins/cluster_generator``
(see SURVEY.md): equilibrium cluster models, Eddington-inversion particle
sampling, merger IC composition, divergence-free Gaussian random fields and
simulation-code exporters — redesigned for XLA: fixed-shape functional
compute, batched fixed-order quadrature, inverse-CDF sampling with
``jax.random``, ensemble ``vmap`` and ``jax.sharding`` multi-chip scaling.
"""

from __future__ import annotations

import jax as _jax

from .core.config import cgparams as _cgparams

if _cgparams["numerical"]["enable_x64"]:
    # Cumulative integrals at 1e-6 relative accuracy require f64
    # (SURVEY.md §7); stages that tolerate f32/bf16 opt in explicitly.
    _jax.config.update("jax_enable_x64", True)

from .core import (  # noqa: E402
    Cosmology,
    G,
    cgparams,
    default_cosmology,
    kboltz,
    log_radius_grid,
    mp,
    mu,
    mue,
    mylog,
)
from .profiles import *  # noqa: F401,F403,E402
from .profiles import relations  # noqa: E402
from .profiles.relations import (  # noqa: E402
    convert_ne_to_density,
    f_gas,
    m_bcg,
    m_sat,
    r_bcg,
)
from .model import ClusterModel, HydrostaticEquilibrium  # noqa: E402
from .virial import VirialEquilibrium  # noqa: E402
from .particles import ClusterParticles  # noqa: E402
from .ics import ClusterICs, compute_centers_for_binary  # noqa: E402
from .fields import (  # noqa: E402
    ClusterField,
    GaussianRandomField,
    RadialRandomMagneticField,
    RadialRandomMagneticVectorPotential,
    RadialRandomVelocityField,
    RandomMagneticField,
    RandomMagneticVectorPotential,
    RandomVelocityField,
)
from .codes import (  # noqa: E402
    resample_arepo_ics,
    setup_arepo_ics,
    setup_flash_ics,
    setup_gamer_ics,
    setup_ramses_ics,
)

__version__ = "0.1.0"
