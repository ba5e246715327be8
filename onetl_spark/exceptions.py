"""Engine exceptions.

Mirrors the reference's exception taxonomy (onetl/exception.py:21-146)
with plain Python classes.
"""

from __future__ import annotations


class OnetlSparkError(Exception):
    """Base class for all engine errors."""


class NoDataError(OnetlSparkError):
    """Raised by ``DBReader.raise_if_no_data`` when the source window is empty."""


class TargetAlreadyExistsError(OnetlSparkError):
    """Write mode ``error`` and the target already exists."""


class DirectoryNotFoundError(OnetlSparkError):
    """Remote/local directory is missing."""


class DirectoryExistsError(OnetlSparkError):
    """Target directory already exists (file-df writer ``error`` mode)."""


class NotAFileError(OnetlSparkError):
    pass


class NotADirectoryError_(OnetlSparkError):
    pass


class FileDoesNotExistError(OnetlSparkError):
    pass


class SkippedFilesError(OnetlSparkError):
    """File transfer produced skipped files and options demand a failure."""


class FailedFilesError(OnetlSparkError):
    """File transfer produced failed files."""


class ZeroFileSizeError(OnetlSparkError):
    pass


class TooManyParallelJobsError(OnetlSparkError):
    """Parallel fan-out would exceed a server-side connection guardrail."""


class IllegalWindowError(OnetlSparkError):
    """HWM window edges are inconsistent (e.g. non-monotonic batch step)."""


class StrategyError(OnetlSparkError):
    """Strategy misuse (wrong nesting, HWM mismatch, batch outside loop)."""
