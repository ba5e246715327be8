"""FileMover — remote→remote rename within one connection
(onetl/file/file_mover/file_mover.py:55,163,310)."""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import PurePosixPath

from onetl_spark.file.transfer.connection import FileConnection
from onetl_spark.hooks import slot, support_hooks
from onetl_spark.file.transfer.paths import RemoteFile
from onetl_spark.file.transfer.results import FileResult

log = logging.getLogger(__name__)


@dataclass
class FileMoverOptions:
    if_exists: str = "error"  # error|ignore|overwrite


@support_hooks
@dataclass
class FileMover:
    connection: FileConnection
    source_path: str
    target_path: str
    filters: list = field(default_factory=list)
    limits: list = field(default_factory=list)
    options: FileMoverOptions = field(default_factory=FileMoverOptions)

    def view_files(self) -> list[RemoteFile]:
        from onetl_spark.file.transfer.limits import reset_limits

        reset_limits(self.limits)
        return list(self.connection.walk(self.source_path, self.filters, self.limits))

    @slot
    def run(self, files: list | None = None) -> FileResult:
        remote_files = files if files is not None else self.view_files()
        result = FileResult()
        for file in remote_files:
            path = file.path if isinstance(file, RemoteFile) else PurePosixPath(str(file))
            rel = path.relative_to(self.source_path)
            target = PurePosixPath(self.target_path) / rel
            try:
                if self.connection.is_file(str(target)):
                    if self.options.if_exists == "error":
                        raise FileExistsError(f"Target {target} already exists")
                    if self.options.if_exists == "ignore":
                        result.skipped.append(path)
                        continue
                    self.connection.remove_file(str(target))
                self.connection.rename_file(str(path), str(target))
                result.successful.append(target)
            except Exception:
                log.exception("move failed for %s", path)
                result.failed.append(path)
        return result
