"""File limits (onetl/file/limit/*.py): stateful stop conditions that
short-circuit the directory walk."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

from onetl_spark.file.transfer.paths import RemoteFile


@dataclass
class MaxFilesCount:
    """Stop after N files (onetl/file/limit/max_files_count.py:18)."""

    limit: int
    _counter: int = field(default=0, repr=False)

    def reset(self) -> None:
        self._counter = 0

    def stops_at(self, obj) -> bool:
        if not isinstance(obj, RemoteFile):
            return False
        self._counter += 1
        return self._counter > self.limit

    @property
    def is_reached(self) -> bool:
        return self._counter > self.limit


@dataclass
class TotalFilesSize:
    """Stop after cumulative bytes (onetl/file/limit/total_files_size.py:20)."""

    limit: int
    _total: int = field(default=0, repr=False)

    def reset(self) -> None:
        self._total = 0

    def stops_at(self, obj) -> bool:
        if not isinstance(obj, RemoteFile):
            return False
        self._total += obj.stat.st_size
        return self._total > self.limit

    @property
    def is_reached(self) -> bool:
        return self._total > self.limit


def limits_stop_at(obj, limits: Iterable) -> bool:
    """True if ANY limit is exceeded by this object (limits_stop_at.py:13)."""
    return any(limit.stops_at(obj) for limit in limits)


def limits_reached(limits: Iterable) -> bool:
    return any(limit.is_reached for limit in limits)


def reset_limits(limits: Iterable) -> None:
    for limit in limits:
        limit.reset()
