"""Remote path/file metadata objects.

Reference equivalents: RemotePath (onetl/impl/remote_path.py:6),
RemoteFile (remote_file.py:15), RemotePathStat (remote_path_stat.py:11),
FileSet (onetl/file/file_set.py:18 — ordered, de-duplicated).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import PurePosixPath

RemotePath = PurePosixPath


@dataclass(frozen=True)
class RemotePathStat:
    st_size: int = 0
    st_mtime: float = 0.0
    st_uid: int | str | None = None
    st_gid: int | str | None = None
    st_mode: int | None = None


@dataclass(frozen=True)
class RemoteFile:
    path: RemotePath
    stat: RemotePathStat = field(default_factory=RemotePathStat)

    def __str__(self) -> str:
        return str(self.path)

    @property
    def name(self) -> str:
        return self.path.name


class FileSet(list):
    """Ordered set of files (keyed by str path)."""

    def __init__(self, items=()):
        super().__init__()
        self._seen: set[str] = set()
        for item in items:
            self.append(item)

    def append(self, item) -> None:
        key = str(item)
        if key not in self._seen:
            self._seen.add(key)
            super().append(item)

    def extend(self, items) -> None:
        for item in items:
            self.append(item)

    @property
    def total_size(self) -> int:
        return sum(getattr(f, "stat", RemotePathStat()).st_size for f in self)
