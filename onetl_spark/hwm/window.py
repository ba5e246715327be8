"""Read-window primitives.

Semantics follow the reference's ``onetl/hwm/window.py:7-22``:
a ``Window`` is a pair of ``Edge`` objects over one expression, each edge
carrying a value and an inclusivity flag. ``None`` value means unbounded.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Edge:
    value: Any = None
    including: bool = True

    @property
    def is_set(self) -> bool:
        return self.value is not None


@dataclass(frozen=True)
class Window:
    expression: str
    start_from: Edge = field(default_factory=Edge)
    stop_at: Edge = field(default_factory=Edge)

    @property
    def is_set(self) -> bool:
        return self.start_from.is_set or self.stop_at.is_set
