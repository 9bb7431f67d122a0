"""FieldInfoContainer: a dict of DerivedField entries with the
add_output_field/add_field/alias registration surface the frontend's
setup_fluid_fields drives (real yt: yt/fields/field_info_container.py)."""

from __future__ import annotations


class DerivedField:
    def __init__(self, name, sampling_type="cell", function=None, units="",
                 aliases=(), display_name=None, alias_of=None):
        self.name = name
        self.sampling_type = sampling_type
        self.function = function
        self.units = units
        self.aliases = tuple(aliases)
        self.display_name = display_name
        self.alias_of = alias_of

    def __repr__(self):
        return f"<DerivedField {self.name} [{self.units}]>"


class FieldInfoContainer(dict):
    known_other_fields = ()
    known_particle_fields = ()

    def __init__(self, ds, field_list, slice_info=None):
        super().__init__()
        self.ds = ds
        self.field_list = list(field_list)
        self.slice_info = slice_info
        # register every on-disk field declared in known_other_fields,
        # creating its aliases, the way yt's container constructor does
        known = dict(self.known_other_fields)
        for ftype, fname in self.field_list:
            units, aliases, display = known.get(fname, ("", [], None))
            self.add_output_field((ftype, fname), sampling_type="cell",
                                  units=units, display_name=display)
            for alias in aliases:
                self.alias(("gas", alias), (ftype, fname), units=units)

    # ------------------------------------------------------- registration
    def add_output_field(self, name, sampling_type="cell", units="",
                         display_name=None, **kwargs):
        self[name] = DerivedField(name, sampling_type=sampling_type,
                                  units=units, display_name=display_name)

    def add_field(self, name, sampling_type="cell", function=None, units="",
                  **kwargs):
        self[name] = DerivedField(name, sampling_type=sampling_type,
                                  function=function, units=units)

    def alias(self, new_name, original_name, units=None):
        orig = self.get(original_name)

        def _read(field, data, _orig=original_name):
            return data[_orig]

        self[new_name] = DerivedField(
            new_name, sampling_type="cell", function=_read,
            units=units if units is not None
            else (orig.units if orig else ""),
            alias_of=original_name)

    def setup_fluid_fields(self):  # pragma: no cover - frontend overrides
        pass

    def setup_particle_fields(self, ptype):
        return None
