from onetl_spark.file.transfer.connection import FileConnection, LocalFileConnection
from onetl_spark.file.transfer.filters import (
    ExcludeDir,
    FileHWMFilter,
    FileModifiedTime,
    FileSizeRange,
    Glob,
    Regexp,
    match_all_filters,
)
from onetl_spark.file.transfer.limits import (
    MaxFilesCount,
    TotalFilesSize,
    limits_reached,
    reset_limits,
)
from onetl_spark.file.transfer.results import FileResult, TransferStatus
from onetl_spark.file.transfer.downloader import FileDownloader
from onetl_spark.file.transfer.uploader import FileUploader
from onetl_spark.file.transfer.mover import FileMover

__all__ = [
    "FileConnection",
    "LocalFileConnection",
    "Glob",
    "Regexp",
    "ExcludeDir",
    "FileSizeRange",
    "FileModifiedTime",
    "FileHWMFilter",
    "match_all_filters",
    "MaxFilesCount",
    "TotalFilesSize",
    "limits_reached",
    "reset_limits",
    "FileResult",
    "TransferStatus",
    "FileDownloader",
    "FileUploader",
    "FileMover",
]
