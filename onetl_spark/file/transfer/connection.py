"""File-transfer connections.

``FileConnection`` is the primitive protocol the reference defines
(onetl/connection/file_connection/file_connection.py:769-838 —
_list_dir/_download_file/_upload_file/_rename_file/_remove_file/... plus
check/is_file/is_dir/get_stat :131-196) with the shared ``walk``
implementation (:438-531 — recursive traversal with filter pruning and
limit short-circuit).

``LocalFileConnection`` is a complete implementation over the local
filesystem (fully testable here). Network clients (FTP/FTPS/SFTP/S3/
WebDAV/Samba/HDFS) implement the same primitives behind import-gated
client libraries; their walk/filter/limit/transfer logic is THIS shared
code, so testing LocalFileConnection exercises the orchestration they
share.
"""

from __future__ import annotations

import os
import shutil
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Iterable, Iterator

from onetl_spark.exceptions import DirectoryNotFoundError
from onetl_spark.file.transfer.filters import match_all_filters
from onetl_spark.file.transfer.limits import limits_reached, limits_stop_at
from onetl_spark.file.transfer.paths import RemoteFile, RemotePath, RemotePathStat


class FileConnection(ABC):
    # --- primitives every client implements -------------------------------

    @abstractmethod
    def _list_dir(self, path: str) -> list[tuple[str, RemotePathStat, bool]]:
        """[(name, stat, is_dir)] for one directory."""

    @abstractmethod
    def _download_file(self, remote: str, local: str) -> None: ...

    @abstractmethod
    def _upload_file(self, local: str, remote: str) -> None: ...

    @abstractmethod
    def _rename_file(self, source: str, target: str) -> None: ...

    @abstractmethod
    def _remove_file(self, path: str) -> None: ...

    @abstractmethod
    def _create_dir(self, path: str) -> None: ...

    @abstractmethod
    def _get_stat(self, path: str) -> RemotePathStat: ...

    @abstractmethod
    def is_file(self, path: str) -> bool: ...

    @abstractmethod
    def is_dir(self, path: str) -> bool: ...

    def check(self) -> "FileConnection":
        return self

    # --- shared logic ------------------------------------------------------

    def get_stat(self, path: str) -> RemotePathStat:
        return self._get_stat(path)

    def create_dir(self, path: str) -> None:
        self._create_dir(path)

    def rename_file(self, source: str, target: str) -> None:
        self._rename_file(source, target)

    def remove_file(self, path: str) -> None:
        self._remove_file(path)

    def download_file(self, remote: str, local: str) -> None:
        self._download_file(remote, local)

    def upload_file(self, local: str, remote: str) -> None:
        self._upload_file(local, remote)

    def walk(
        self,
        root: str,
        filters: Iterable = (),
        limits: Iterable = (),
    ) -> Iterator[RemoteFile]:
        """Depth-first traversal yielding files that pass every filter,
        stopping as soon as any limit trips (early exit, not post-filter)."""
        if not self.is_dir(root):
            raise DirectoryNotFoundError(f"Directory {root!r} does not exist")
        filters = list(filters)
        limits = list(limits)
        yield from self._walk_inner(RemotePath(root), filters, limits)

    def _walk_inner(self, root: RemotePath, filters, limits) -> Iterator[RemoteFile]:
        for name, stat, is_dir in sorted(self._list_dir(str(root))):
            if limits_reached(limits):
                return
            path = root / name
            if is_dir:
                if match_all_filters(path, filters):
                    yield from self._walk_inner(path, filters, limits)
            else:
                file = RemoteFile(path, stat)
                if not match_all_filters(file, filters):
                    continue
                if limits_stop_at(file, limits):
                    return
                yield file


@dataclass
class LocalFileConnection(FileConnection):
    """Local filesystem client — complete and used by tests; also handy for
    NFS/fuse mounts in production."""

    def _list_dir(self, path: str):
        out = []
        for entry in os.scandir(path):
            st = entry.stat()
            out.append(
                (
                    entry.name,
                    RemotePathStat(st_size=st.st_size, st_mtime=st.st_mtime, st_mode=st.st_mode),
                    entry.is_dir(),
                ),
            )
        return out

    def _download_file(self, remote: str, local: str) -> None:
        shutil.copy2(remote, local)

    def _upload_file(self, local: str, remote: str) -> None:
        shutil.copy2(local, remote)

    def _rename_file(self, source: str, target: str) -> None:
        os.makedirs(os.path.dirname(target), exist_ok=True)
        os.replace(source, target)

    def _remove_file(self, path: str) -> None:
        os.remove(path)

    def _create_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def _get_stat(self, path: str) -> RemotePathStat:
        st = os.stat(path)
        return RemotePathStat(st_size=st.st_size, st_mtime=st.st_mtime, st_mode=st.st_mode)

    def is_file(self, path: str) -> bool:
        return os.path.isfile(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)


def _require(module: str, pip_name: str):
    try:
        return __import__(module)
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            f"{pip_name} is required for this connection (pip install {pip_name})",
        ) from e


@dataclass
class SFTP(FileConnection):  # pragma: no cover - requires paramiko + server
    """SFTP over paramiko (reference onetl/connection/file_connection/sftp.py:50)."""

    host: str = ""
    port: int = 22
    user: str | None = None
    password: str | None = None
    key_file: str | None = None

    def __post_init__(self):
        paramiko = _require("paramiko", "paramiko")
        self._ssh = paramiko.SSHClient()
        self._ssh.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        self._ssh.connect(
            self.host, port=self.port, username=self.user,
            password=self.password, key_filename=self.key_file,
        )
        self._sftp = self._ssh.open_sftp()

    def _list_dir(self, path: str):
        import stat as stat_mod

        out = []
        for attr in self._sftp.listdir_attr(path):
            out.append(
                (
                    attr.filename,
                    RemotePathStat(st_size=attr.st_size or 0, st_mtime=attr.st_mtime or 0),
                    stat_mod.S_ISDIR(attr.st_mode or 0),
                ),
            )
        return out

    def _download_file(self, remote, local):
        self._sftp.get(remote, local)

    def _upload_file(self, local, remote):
        self._sftp.put(local, remote)

    def _rename_file(self, source, target):
        self._sftp.rename(source, target)

    def _remove_file(self, path):
        self._sftp.remove(path)

    def _create_dir(self, path):
        parts = RemotePath(path).parts
        current = ""
        for part in parts:
            current = f"{current}/{part}" if current else part
            try:
                self._sftp.stat(current)
            except FileNotFoundError:
                self._sftp.mkdir(current)

    def _get_stat(self, path):
        st = self._sftp.stat(path)
        return RemotePathStat(st_size=st.st_size or 0, st_mtime=st.st_mtime or 0)

    def is_file(self, path):
        import stat as stat_mod

        try:
            return not stat_mod.S_ISDIR(self._sftp.stat(path).st_mode or 0)
        except FileNotFoundError:
            return False

    def is_dir(self, path):
        import stat as stat_mod

        try:
            return stat_mod.S_ISDIR(self._sftp.stat(path).st_mode or 0)
        except FileNotFoundError:
            return False


@dataclass
class FTP(FileConnection):  # pragma: no cover - requires server
    """FTP via ftplib (reference ftp.py:47)."""

    host: str = ""
    port: int = 21
    user: str | None = None
    password: str | None = None
    tls: bool = False

    def __post_init__(self):
        import ftplib

        self._ftp = ftplib.FTP_TLS() if self.tls else ftplib.FTP()
        self._ftp.connect(self.host, self.port)
        self._ftp.login(self.user or "", self.password or "")
        if self.tls:
            self._ftp.prot_p()

    def _list_dir(self, path: str):
        out = []
        for name, facts in self._ftp.mlsd(path):
            if name in (".", ".."):
                continue
            out.append(
                (
                    name,
                    RemotePathStat(st_size=int(facts.get("size", 0))),
                    facts.get("type") == "dir",
                ),
            )
        return out

    def _download_file(self, remote, local):
        with open(local, "wb") as f:
            self._ftp.retrbinary(f"RETR {remote}", f.write)

    def _upload_file(self, local, remote):
        with open(local, "rb") as f:
            self._ftp.storbinary(f"STOR {remote}", f)

    def _rename_file(self, source, target):
        self._ftp.rename(source, target)

    def _remove_file(self, path):
        self._ftp.delete(path)

    def _create_dir(self, path):
        self._ftp.mkd(path)

    def _get_stat(self, path):
        return RemotePathStat(st_size=self._ftp.size(path) or 0)

    def is_file(self, path):
        try:
            self._ftp.size(path)
            return True
        except Exception:
            return False

    def is_dir(self, path):
        current = self._ftp.pwd()
        try:
            self._ftp.cwd(path)
            return True
        except Exception:
            return False
        finally:
            self._ftp.cwd(current)


class FTPS(FTP):  # pragma: no cover
    def __init__(self, **kwargs):
        super().__init__(tls=True, **kwargs)


@dataclass
class S3(FileConnection):  # pragma: no cover - requires minio/boto client
    """S3 object storage treated as a filesystem (reference s3.py:52)."""

    host: str = ""
    port: int | None = None
    bucket: str = ""
    access_key: str | None = None
    secret_key: str | None = None
    protocol: str = "https"

    def __post_init__(self):
        minio = _require("minio", "minio")
        endpoint = f"{self.host}:{self.port}" if self.port else self.host
        self._client = minio.Minio(
            endpoint,
            access_key=self.access_key,
            secret_key=self.secret_key,
            secure=self.protocol == "https",
        )

    def _key(self, path: str) -> str:
        return str(path).lstrip("/")

    def _list_dir(self, path: str):
        prefix = self._key(path)
        prefix = f"{prefix}/" if prefix else ""
        out = []
        for obj in self._client.list_objects(self.bucket, prefix=prefix, recursive=False):
            name = obj.object_name[len(prefix):].rstrip("/")
            is_dir = obj.is_dir
            mtime = obj.last_modified.timestamp() if obj.last_modified else 0
            out.append((name, RemotePathStat(st_size=obj.size or 0, st_mtime=mtime), is_dir))
        return out

    def _download_file(self, remote, local):
        self._client.fget_object(self.bucket, self._key(remote), local)

    def _upload_file(self, local, remote):
        self._client.fput_object(self.bucket, self._key(remote), local)

    def _rename_file(self, source, target):
        from minio.commonconfig import CopySource  # type: ignore

        self._client.copy_object(
            self.bucket, self._key(target), CopySource(self.bucket, self._key(source)),
        )
        self._remove_file(source)

    def _remove_file(self, path):
        self._client.remove_object(self.bucket, self._key(path))

    def _create_dir(self, path):
        pass  # S3 has no directories

    def _get_stat(self, path):
        st = self._client.stat_object(self.bucket, self._key(path))
        return RemotePathStat(
            st_size=st.size or 0,
            st_mtime=st.last_modified.timestamp() if st.last_modified else 0,
        )

    def is_file(self, path):
        try:
            self._client.stat_object(self.bucket, self._key(path))
            return True
        except Exception:
            return False

    def is_dir(self, path):
        return any(True for _ in self._client.list_objects(self.bucket, prefix=f"{self._key(path)}/"))


@dataclass
class HDFS(FileConnection):  # pragma: no cover - requires hdfs client
    """WebHDFS client (reference hdfs/connection.py:59)."""

    host: str = ""
    webhdfs_port: int = 50070
    user: str | None = None

    def __post_init__(self):
        hdfs = _require("hdfs", "hdfs")
        self._client = hdfs.InsecureClient(f"http://{self.host}:{self.webhdfs_port}", user=self.user)

    def _list_dir(self, path: str):
        out = []
        for name, status in self._client.list(path, status=True):
            out.append(
                (
                    name,
                    RemotePathStat(
                        st_size=status.get("length", 0),
                        st_mtime=status.get("modificationTime", 0) / 1000,
                    ),
                    status.get("type") == "DIRECTORY",
                ),
            )
        return out

    def _download_file(self, remote, local):
        self._client.download(remote, local, overwrite=True)

    def _upload_file(self, local, remote):
        self._client.upload(remote, local, overwrite=True)

    def _rename_file(self, source, target):
        self._client.rename(source, target)

    def _remove_file(self, path):
        self._client.delete(path)

    def _create_dir(self, path):
        self._client.makedirs(path)

    def _get_stat(self, path):
        status = self._client.status(path)
        return RemotePathStat(
            st_size=status.get("length", 0),
            st_mtime=status.get("modificationTime", 0) / 1000,
        )

    def is_file(self, path):
        status = self._client.status(path, strict=False)
        return bool(status) and status.get("type") == "FILE"

    def is_dir(self, path):
        status = self._client.status(path, strict=False)
        return bool(status) and status.get("type") == "DIRECTORY"


@dataclass
class WebDAV(FileConnection):  # pragma: no cover - requires webdavclient3
    host: str = ""
    port: int | None = None
    user: str | None = None
    password: str | None = None
    protocol: str = "https"

    def __post_init__(self):
        webdav = _require("webdav3.client", "webdavclient3")
        url = f"{self.protocol}://{self.host}" + (f":{self.port}" if self.port else "")
        self._client = webdav.Client(
            {"webdav_hostname": url, "webdav_login": self.user, "webdav_password": self.password},
        )

    def _list_dir(self, path: str):
        out = []
        for info in self._client.list(path, get_info=True)[1:]:
            name = info["path"].rstrip("/").rsplit("/", 1)[-1]
            out.append(
                (name, RemotePathStat(st_size=int(info.get("size") or 0)), info.get("isdir", False)),
            )
        return out

    def _download_file(self, remote, local):
        self._client.download_sync(remote_path=remote, local_path=local)

    def _upload_file(self, local, remote):
        self._client.upload_sync(remote_path=remote, local_path=local)

    def _rename_file(self, source, target):
        self._client.move(remote_path_from=source, remote_path_to=target)

    def _remove_file(self, path):
        self._client.clean(path)

    def _create_dir(self, path):
        self._client.mkdir(path)

    def _get_stat(self, path):
        info = self._client.info(path)
        return RemotePathStat(st_size=int(info.get("size") or 0))

    def is_file(self, path):
        return self._client.check(path) and not self._client.is_dir(path)

    def is_dir(self, path):
        return self._client.check(path) and self._client.is_dir(path)


@dataclass
class Samba(FileConnection):  # pragma: no cover - requires smbprotocol
    host: str = ""
    share: str = ""
    user: str | None = None
    password: str | None = None

    def __post_init__(self):
        _require("smbclient", "smbprotocol")
        import smbclient

        smbclient.register_session(self.host, username=self.user, password=self.password)
        self._smb = smbclient

    def _unc(self, path: str) -> str:
        return rf"\\{self.host}\{self.share}\{str(path).lstrip('/')}".replace("/", "\\")

    def _list_dir(self, path: str):
        out = []
        for entry in self._smb.scandir(self._unc(path)):
            st = entry.stat()
            out.append(
                (entry.name, RemotePathStat(st_size=st.st_size, st_mtime=st.st_mtime), entry.is_dir()),
            )
        return out

    def _download_file(self, remote, local):
        with self._smb.open_file(self._unc(remote), mode="rb") as src, open(local, "wb") as dst:
            shutil.copyfileobj(src, dst)

    def _upload_file(self, local, remote):
        with open(local, "rb") as src, self._smb.open_file(self._unc(remote), mode="wb") as dst:
            shutil.copyfileobj(src, dst)

    def _rename_file(self, source, target):
        self._smb.rename(self._unc(source), self._unc(target))

    def _remove_file(self, path):
        self._smb.remove(self._unc(path))

    def _create_dir(self, path):
        self._smb.makedirs(self._unc(path), exist_ok=True)

    def _get_stat(self, path):
        st = self._smb.stat(self._unc(path))
        return RemotePathStat(st_size=st.st_size, st_mtime=st.st_mtime)

    def is_file(self, path):
        try:
            return self._smb.path.isfile(self._unc(path))
        except Exception:
            return False

    def is_dir(self, path):
        try:
            return self._smb.path.isdir(self._unc(path))
        except Exception:
            return False
