"""Transfer result report objects (onetl/file/file_result.py:28,
file_downloader/result.py): successful/failed/skipped/missing FileSets."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from onetl_spark.file.transfer.paths import FileSet


class TransferStatus(Enum):
    SUCCESSFUL = "successful"
    FAILED = "failed"
    SKIPPED = "skipped"
    MISSING = "missing"


@dataclass
class FileResult:
    successful: FileSet = field(default_factory=FileSet)
    failed: FileSet = field(default_factory=FileSet)
    skipped: FileSet = field(default_factory=FileSet)
    missing: FileSet = field(default_factory=FileSet)

    @property
    def total_count(self) -> int:
        return len(self.successful) + len(self.failed) + len(self.skipped) + len(self.missing)

    @property
    def successful_count(self) -> int:
        return len(self.successful)

    def raise_if_failed(self) -> None:
        from onetl_spark.exceptions import FailedFilesError

        if self.failed:
            raise FailedFilesError(f"{len(self.failed)} files failed: {list(map(str, self.failed))[:10]}")

    def summary(self) -> str:
        return (
            f"successful={len(self.successful)} failed={len(self.failed)} "
            f"skipped={len(self.skipped)} missing={len(self.missing)}"
        )


DownloadResult = FileResult
UploadResult = FileResult
MoveResult = FileResult
