"""Model registry: `arch_class` name -> Module class.

Replaces the reference's importlib dynamic loading
(utils.py:2047-2048): cfgs name `arch_library=tpukaldi.models` (or the
reference's `neural_networks`, mapped here for compatibility) and an
`arch_class`; resolution goes through this table, with importlib fallback
for user-provided libraries.
"""

from __future__ import annotations

import importlib
from typing import Dict, Type

_REGISTRY: Dict[str, Type] = {}


def register(cls=None, *, name: str = None):
    def wrap(c):
        _REGISTRY[name or c.__name__] = c
        return c

    return wrap(cls) if cls is not None else wrap


def resolve(class_name: str, library: str = "tpukaldi.models"):
    if class_name in _REGISTRY:
        return _REGISTRY[class_name]
    if library in ("neural_networks", "quaternion_neural_networks", ""):
        # reference library names map onto our registry
        raise KeyError(
            f"model class {class_name!r} not in tpukaldi registry "
            f"(reference library {library!r}); registered: {sorted(_REGISTRY)}"
        )
    module = importlib.import_module(library)
    return getattr(module, class_name)


def registered() -> Dict[str, Type]:
    return dict(_REGISTRY)
