"""3D field layer (L5')."""

from .grf import (
    ClusterField,
    GaussianRandomField,
    RadialRandomMagneticField,
    RadialRandomMagneticVectorPotential,
    RadialRandomVelocityField,
    RandomMagneticField,
    RandomMagneticVectorPotential,
    RandomVelocityField,
)

__all__ = [
    "ClusterField", "GaussianRandomField", "RadialRandomMagneticField",
    "RadialRandomMagneticVectorPotential", "RadialRandomVelocityField",
    "RandomMagneticField", "RandomMagneticVectorPotential",
    "RandomVelocityField",
]
