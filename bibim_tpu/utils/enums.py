"""EnumArray / enum iteration (reference src/enum_array.h:7-96).

``EnumArray[E, T]`` in the reference is a fixed array indexed by an enum class
with a COUNT sentinel. Here it is a thin mapping over an ``enum.Enum`` that
preserves declaration order and supports iteration over values, which is all
the call sites (material map tables, G-buffer option labels) need.
"""

from __future__ import annotations

from enum import Enum
from typing import Dict, Generic, Iterable, Iterator, Tuple, Type, TypeVar

E = TypeVar("E", bound=Enum)
T = TypeVar("T")


def all_enums(enum_cls: Type[E]) -> Tuple[E, ...]:
    """AllEnums<E> range helper (enum_array.h:87)."""
    return tuple(enum_cls)


def enum_count(enum_cls: Type[Enum]) -> int:
    """EnumCount<E> (enum_array.h)."""
    return len(enum_cls)


class EnumArray(Generic[E, T]):
    """Fixed-size mapping keyed by every member of an enum class."""

    def __init__(self, enum_cls: Type[E], values: Iterable[T] | None = None, fill: T | None = None):
        self._enum_cls = enum_cls
        members = all_enums(enum_cls)
        if values is not None:
            vals = list(values)
            if len(vals) != len(members):
                raise ValueError(
                    f"EnumArray({enum_cls.__name__}) needs {len(members)} values, got {len(vals)}"
                )
            self._data: Dict[E, T] = dict(zip(members, vals))
        else:
            self._data = {m: fill for m in members}

    def __getitem__(self, key: E) -> T:
        return self._data[key]

    def __setitem__(self, key: E, value: T) -> None:
        if not isinstance(key, self._enum_cls):
            raise KeyError(key)
        self._data[key] = value

    def __iter__(self) -> Iterator[T]:
        return iter(self._data.values())

    def __len__(self) -> int:
        return len(self._data)

    def items(self):
        return self._data.items()
