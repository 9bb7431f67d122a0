"""Tiny quantity/unit-system stand-ins (no dimensional algebra — just
enough structure to carry (value, unit) pairs around like yt's unyt does).
"""

from __future__ import annotations


class Quantity:
    """A (value, unit) pair; ``Dataset.quan`` returns these."""

    def __init__(self, value, units):
        self.value = float(value)
        self.units = str(units)

    def __float__(self):
        return self.value

    def __repr__(self):
        return f"{self.value} {self.units}"

    def __eq__(self, other):
        return (isinstance(other, Quantity) and self.value == other.value
                and self.units == other.units)


class UnitSystem:
    """Maps dimension names to unit strings, like yt's unit_system object.

    Only the dimensions the frontend's field setup asks for are defined.
    """

    _CGS = {
        "velocity": "cm/s",
        "pressure": "dyn/cm**2",
        "density": "g/cm**3",
        "specific_energy": "erg/g",
        "temperature": "K",
    }

    def __init__(self, name="cgs"):
        self.name = name

    def __getitem__(self, dimension):
        return self._CGS[dimension]
