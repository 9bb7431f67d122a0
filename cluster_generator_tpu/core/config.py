"""Package configuration.

The reference loads a YAML file with custom ``!unyt``/``!lambda`` tags into a
mutable global (``cluster_generator/utils.py:25-58``); the ``!lambda`` tag
*evals arbitrary code* from the config.  Here the config is a plain nested
dict with safe YAML overrides: no code execution, no unit objects.  The
MOND/alt-gravity section of the reference config (bin/config.yaml "gravity")
is config-for-absent-code in the snapshot (SURVEY.md §5.6) and is represented
as a documented extension point.
"""

from __future__ import annotations

import copy
import os

__all__ = ["cgparams", "load_config", "defaults"]

defaults: dict = {
    "system": {
        "logging": {
            "main": {
                "enabled": True,
                "format": "%(name)-3s : [%(levelname)-9s] %(asctime)s %(message)s",
                "level": "INFO",
                "stream": "STDERR",
            },
            "developer": {"enabled": False, "output_directory": None},
        },
        "display": {"progress_bars": False},
    },
    "physics": {
        "hydrogen_abundance": 0.76,
    },
    "numerical": {
        # fixed Gauss-Legendre panel order for cumulative integrals
        "quadrature_order": 16,
        # inverse speed-CDF tables, shared by the class API
        # (VirialEquilibrium._speed_table) and the fused pipeline
        # (pipeline.build_speed_tables): speed-grid resolution, quantile
        # resolution, and whether the cumulative/inversion runs in float32
        # (quantile error ~1e-7, negligible vs 1/n_q; ~10x faster on TPU
        # where f64 is emulated)
        "velocity_table_speeds": 512,
        "velocity_table_quantiles": 512,
        "velocity_table_float32": True,
        # f(E) node-grid resolution for the float32 table build (virial
        # .speed_inverse_cdf_table): "body" nodes cover [0, 0.9 e_max),
        # "top" nodes the steep last decade [0.9 e_max, e_max].  At the
        # 4096/4096 defaults the worst-row speed-table error is 1.9e-3 of
        # v_esc and the drawn sigma_v(r) profile matches the Jeans
        # prediction to ~1% (tests/test_sampling.py observable test).
        "df_node_grid_body": 4096,
        "df_node_grid_top": 4096,
        # default float precision for the compute path
        "enable_x64": True,
    },
    # Extension point: alternative gravities (MOND/QUMOND/AQUAL/EMOND) are
    # not implemented (nor are they in the reference snapshot); interpolation
    # functions must be registered programmatically, never eval'd from YAML.
    "gravity": {"mond": {"a0_m_s2": 1.2e-10}},
}


def _deep_update(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_config(path: str | None = None) -> dict:
    """Return config defaults, optionally deep-merged with a safe-YAML file.

    The override path may also be supplied via ``CLUSTER_GENERATOR_TPU_CONFIG``.
    """
    cfg = copy.deepcopy(defaults)
    path = path or os.environ.get("CLUSTER_GENERATOR_TPU_CONFIG")
    if path and os.path.exists(path):
        import yaml

        with open(path, "r") as f:
            user = yaml.safe_load(f) or {}
        _deep_update(cfg, user)
    return cfg


cgparams = load_config()
