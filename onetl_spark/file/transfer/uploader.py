"""FileUploader — local→remote mirror of the downloader, without HWM
filtering on upload (onetl/file/file_uploader/file_uploader.py:51,158,314).
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from pathlib import Path, PurePosixPath

from onetl_spark.file.transfer.connection import FileConnection
from onetl_spark.hooks import slot, support_hooks
from onetl_spark.file.transfer.results import FileResult

log = logging.getLogger(__name__)


@dataclass
class FileUploaderOptions:
    if_exists: str = "error"  # error|ignore|overwrite|replace_entire_directory
    delete_local: bool = False
    workers: int = 1


@support_hooks
@dataclass
class FileUploader:
    connection: FileConnection
    local_path: str
    target_path: str
    options: FileUploaderOptions = field(default_factory=FileUploaderOptions)

    def view_files(self) -> list[str]:
        out = []
        for root, _dirs, names in os.walk(self.local_path):
            for name in sorted(names):
                out.append(os.path.join(root, name))
        return sorted(out)

    @slot
    def run(self, files: list | None = None) -> FileResult:
        local_files = [str(f) for f in files] if files is not None else self.view_files()

        result = FileResult()
        plan = []
        for local in local_files:
            if not os.path.isfile(local):
                result.missing.append(PurePosixPath(local))
                continue
            rel = Path(local).relative_to(self.local_path)
            remote = str(PurePosixPath(self.target_path) / PurePosixPath(*rel.parts))
            plan.append((local, remote))

        for _, remote in plan:
            self.connection.create_dir(str(PurePosixPath(remote).parent))

        with ThreadPoolExecutor(max_workers=max(1, self.options.workers)) as pool:
            futures = {pool.submit(self._copy_one, lo, re): (lo, re) for lo, re in plan}
            for future in as_completed(futures):
                local, remote = futures[future]
                try:
                    status = future.result()
                except Exception:
                    log.exception("upload failed for %s", local)
                    result.failed.append(PurePosixPath(local))
                    continue
                getattr(result, status).append(PurePosixPath(remote))
        return result

    def _copy_one(self, local: str, remote: str) -> str:
        if self.connection.is_file(remote):
            mode = self.options.if_exists
            if mode == "error":
                raise FileExistsError(f"Remote file {remote} already exists")
            if mode == "ignore":
                return "skipped"
        self.connection.upload_file(local, remote)
        if self.options.delete_local:
            os.remove(local)
        return "successful"
