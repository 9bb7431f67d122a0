"""yt.load: sniff the file against every registered Dataset subclass's
``_is_valid`` and instantiate the (unique) match — the same frontend
dispatch real yt performs in yt/loaders.py."""

from __future__ import annotations

from .data_objects.static_output import _dataset_registry


class YTUnidentifiedDataType(Exception):
    pass


class YTAmbiguousDataType(Exception):
    pass


def load(fn, *args, **kwargs):
    candidates = [cls for cls in _dataset_registry
                  if getattr(cls, "_is_valid", None)
                  and cls._is_valid(str(fn), *args, **kwargs)]
    if not candidates:
        raise YTUnidentifiedDataType(fn)
    if len(candidates) > 1:
        raise YTAmbiguousDataType(f"{fn}: {candidates}")
    return candidates[0](str(fn), **kwargs)
