"""Dataset base class: subclass registration, the __init__ -> parse ->
units call sequence, and the lazily-built ``.index`` property."""

from __future__ import annotations

import os
from types import SimpleNamespace

from ..units import Quantity, UnitSystem

_dataset_registry = []


class Dataset:
    _index_class = None
    _field_info_class = None
    _load_requirements = []
    fluid_types = ("gas",)
    particle_types = ()
    default_fluid_type = "gas"

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        _dataset_registry.append(cls)

    def __init__(self, filename, dataset_type=None, units_override=None,
                 unit_system="cgs", default_species_fields=None, **_ignored):
        self.dataset_type = dataset_type
        self.parameter_filename = str(filename)
        self.basename = os.path.basename(self.parameter_filename)
        self.directory = os.path.dirname(self.parameter_filename)
        self.units_override = units_override
        self.unit_system = UnitSystem(unit_system)
        self.default_species_fields = default_species_fields
        # cartesian coordinate handler surface used by field setup
        self.coordinates = SimpleNamespace(axis_order=("x", "y", "z"))
        self.field_info = None
        self._instantiated_index = None
        self._parse_parameter_file()
        self._set_code_unit_attributes()

    # frontends call self.quan(...) inside _set_code_unit_attributes
    def quan(self, value, units):
        return Quantity(value, units)

    @property
    def index(self):
        if self._instantiated_index is None:
            self._instantiated_index = self._index_class(
                self, dataset_type=self.dataset_type)
            self.create_field_info()
        return self._instantiated_index

    def create_field_info(self):
        self.field_info = self._field_info_class(
            self, self._instantiated_index.field_list)
        self.field_info.setup_fluid_fields()

    @property
    def field_list(self):
        return self.index.field_list

    def _parse_parameter_file(self):  # pragma: no cover - frontend overrides
        raise NotImplementedError

    def _set_code_unit_attributes(self):  # pragma: no cover
        raise NotImplementedError
