"""File filters (onetl/file/filter/*.py).

Each filter exposes ``match(file_or_dir) -> bool``; directories are only
inspected by ``ExcludeDir`` (subtree pruning), other filters pass
directories through so the walk can descend.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass
from datetime import datetime
from pathlib import PurePosixPath
from typing import Iterable

from onetl_spark.file.transfer.paths import RemoteFile
from onetl_spark.hwm.types import FileListHWM, FileModifiedTimeHWM


@dataclass
class Glob:
    """Glob on the file NAME (onetl/file/filter/glob.py:16)."""

    pattern: str

    def match(self, obj) -> bool:
        if isinstance(obj, RemoteFile):
            return fnmatch.fnmatch(obj.name, self.pattern)
        return True


@dataclass
class Regexp:
    """Regex on the whole path, IGNORECASE|DOTALL like the reference
    (onetl/file/filter/regexp.py:17)."""

    pattern: str

    def __post_init__(self):
        self._re = re.compile(self.pattern, re.IGNORECASE | re.DOTALL)

    def match(self, obj) -> bool:
        if isinstance(obj, RemoteFile):
            return self._re.search(str(obj.path)) is not None
        return True


@dataclass
class ExcludeDir:
    """Prune an entire subtree (onetl/file/filter/exclude_dir.py:16)."""

    path: str

    def match(self, obj) -> bool:
        excluded = PurePosixPath(self.path)
        target = obj.path if isinstance(obj, RemoteFile) else PurePosixPath(str(obj))
        return not (target == excluded or excluded in target.parents)


@dataclass
class FileSizeRange:
    """min/max byte size (onetl/file/filter/file_size.py:18)."""

    min: int | None = None
    max: int | None = None

    def match(self, obj) -> bool:
        if not isinstance(obj, RemoteFile):
            return True
        size = obj.stat.st_size
        if self.min is not None and size < self.min:
            return False
        if self.max is not None and size > self.max:
            return False
        return True


@dataclass
class FileModifiedTime:
    """since/until mtime (onetl/file/filter/file_mtime.py:19)."""

    since: datetime | None = None
    until: datetime | None = None

    def match(self, obj) -> bool:
        if not isinstance(obj, RemoteFile):
            return True
        mtime = datetime.fromtimestamp(obj.stat.st_mtime)
        if self.since is not None and mtime < self.since:
            return False
        if self.until is not None and mtime > self.until:
            return False
        return True


@dataclass
class FileHWMFilter:
    """Drop files already covered by a FileListHWM / FileModifiedTimeHWM
    (onetl/file/filter/file_hwm.py:11)."""

    hwm: FileListHWM | FileModifiedTimeHWM

    def match(self, obj) -> bool:
        if not isinstance(obj, RemoteFile):
            return True
        if isinstance(self.hwm, FileListHWM):
            return not self.hwm.covers(str(obj.path))
        return not self.hwm.covers(obj.stat.st_mtime)


def match_all_filters(obj, filters: Iterable) -> bool:
    """AND-combine (onetl/file/filter/match_all_filters.py)."""
    return all(f.match(obj) for f in filters)
