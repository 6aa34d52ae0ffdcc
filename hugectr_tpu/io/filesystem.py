"""Pluggable filesystem layer.

Analog of the reference's FileSystem abstraction (HugeCTR/include/io/
filesystem.hpp: Local/HDFS/S3/GCS backends selected by DataSourceParams).
Backed by fsspec: local paths stay on the fast os path; `hdfs://`, `s3://`,
`gs://` URLs route to the matching fsspec implementation when its driver is
installed (gated with a clear error otherwise).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List


@dataclasses.dataclass
class DataSourceParams:
    """Reference-parity backend selector (include/io/filesystem.hpp:122)."""

    source: str = "local"  # local | hdfs | s3 | gcs
    server: str = ""
    port: int = 0

    def prefix(self) -> str:
        if self.source == "local":
            return ""
        scheme = {"hdfs": "hdfs", "s3": "s3", "gcs": "gs"}[self.source]
        if self.server:
            return f"{scheme}://{self.server}:{self.port}/"
        return f"{scheme}://"


class FileSystem:
    """Thin fsspec wrapper with a local fast path."""

    def __init__(self, url_or_path: str = ""):
        self.is_remote = "://" in url_or_path
        if self.is_remote:
            import fsspec

            protocol = url_or_path.split("://", 1)[0]
            try:
                self.fs = fsspec.filesystem(protocol)
            except (ImportError, ValueError) as e:
                raise RuntimeError(
                    f"filesystem backend {protocol!r} needs its fsspec driver "
                    f"installed (reference parity: ENABLE_HDFS/S3/GCS builds): {e}"
                ) from e
        else:
            self.fs = None

    def open(self, path: str, mode: str = "rb"):
        if self.fs is None:
            if "w" in mode:
                os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
            return open(path, mode)
        return self.fs.open(path, mode)

    def exists(self, path: str) -> bool:
        if self.fs is None:
            return os.path.exists(path)
        return self.fs.exists(path)

    def ls(self, path: str) -> List[str]:
        if self.fs is None:
            return sorted(os.listdir(path))
        return self.fs.ls(path)

    def size(self, path: str) -> int:
        if self.fs is None:
            return os.path.getsize(path)
        return self.fs.size(path)

    def write(self, path: str, data: bytes) -> None:
        with self.open(path, "wb") as f:
            f.write(data)

    def read(self, path: str) -> bytes:
        with self.open(path, "rb") as f:
            return f.read()


def get_fs(path: str) -> FileSystem:
    return FileSystem(path)
