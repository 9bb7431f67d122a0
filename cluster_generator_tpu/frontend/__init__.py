"""yt frontend plugin for cluster_generator_tpu chunked-grid datasets.

Implements the yt frontend interface (Dataset/Hierarchy/Grid/FieldInfo/
IOHandler) for the YTHDF5 files written by
:mod:`cluster_generator_tpu.data_structures` — feature-equivalent to the
reference's ``cluster_generator/frontend`` package.  ``yt`` is an optional
dependency: importing this subpackage without yt raises ImportError with a
clear message, and the rest of the framework is unaffected.
"""

try:
    import yt  # noqa: F401

    _HAS_YT = True
except ImportError:  # pragma: no cover - environment without yt
    _HAS_YT = False

if _HAS_YT:
    from .data_structures import (
        ClusterGeneratorDataset,
        ClusterGeneratorGrid,
        ClusterGeneratorHierarchy,
    )
    from .fields import ClusterGeneratorFieldInfo
    from .io import ClusterGeneratorIOHandler

    __all__ = [
        "ClusterGeneratorDataset", "ClusterGeneratorGrid",
        "ClusterGeneratorHierarchy", "ClusterGeneratorFieldInfo",
        "ClusterGeneratorIOHandler",
    ]
else:
    __all__ = []

    def __getattr__(name):
        raise ImportError(
            f"cluster_generator_tpu.frontend.{name} requires the optional "
            "dependency 'yt' (pip install yt)."
        )
