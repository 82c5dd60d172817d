"""String-keyed schema class registry for by-name Nested references.

Parity: /root/reference/src/marshmallow/class_registry.py:29-94 —
same lookup semantics (multiple registrations under one name raise
unless ``all=True``), new implementation.
"""

from __future__ import annotations

from .errors import RegistryError

_registry: dict[str, list[type]] = {}


def register(classname: str, cls: type) -> None:
    module = cls.__module__
    fullpath = f"{module}.{classname}"
    if classname in _registry and not any(
        each.__module__ == module for each in _registry[classname]
    ):
        _registry[classname].append(cls)
    elif classname not in _registry:
        _registry[classname] = [cls]
    _registry[fullpath] = [cls]


def get_class(classname: str, all: bool = False):
    try:
        classes = _registry[classname]
    except KeyError as error:
        raise RegistryError(
            f"Class with name {classname!r} was not found. You may need "
            "to import the class."
        ) from error
    if len(classes) > 1:
        if all:
            return _registry[classname]
        raise RegistryError(
            f"Multiple classes with name {classname!r} "
            "were found. Please use the full, "
            "module-qualified path."
        )
    return _registry[classname][0]
