"""Public frontend API (reference frontend/api.py)."""

from . import (
    ClusterGeneratorDataset,
    ClusterGeneratorFieldInfo,
    ClusterGeneratorGrid,
    ClusterGeneratorHierarchy,
    ClusterGeneratorIOHandler,
)

__all__ = [
    "ClusterGeneratorDataset", "ClusterGeneratorFieldInfo",
    "ClusterGeneratorGrid", "ClusterGeneratorHierarchy",
    "ClusterGeneratorIOHandler",
]
