"""Pluggable filesystem layer.

Analog of the reference's FileSystem abstraction (HugeCTR/include/io/
filesystem.hpp: Local/HDFS/S3/GCS backends selected by DataSourceParams).
Backed by fsspec: local paths stay on the fast os path; `hdfs://`, `s3://`,
`gs://` URLs route to the matching fsspec implementation when its driver is
installed (gated with a clear error otherwise).
"""
from __future__ import annotations

import os
from typing import List

# the canonical DataSourceParams (make_uri) lives in core.config; re-export
# so older imports keep working without a second scheme-mapping copy
from ..core.config import DataSourceParams  # noqa: F401


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


# --------------------------------------------------------------------------
# Convenience helpers so checkpoint/snapshot code is backend-agnostic
# (reference: EmbeddingParameterIO + Model::download_params_to_files write
# through the FileSystem interface so HDFS/S3/GCS prefixes work,
# embedding_storage/weight_io/fs_interface.cpp).


def makedirs(path: str) -> None:
    fs = FileSystem(path)
    if fs.fs is None:
        os.makedirs(path, exist_ok=True)
    else:
        fs.fs.makedirs(path, exist_ok=True)


def exists(path: str) -> bool:
    return FileSystem(path).exists(path)


def isdir(path: str) -> bool:
    fs = FileSystem(path)
    if fs.fs is None:
        return os.path.isdir(path)
    try:
        return fs.fs.isdir(path)
    except Exception:
        return fs.fs.exists(path)


def listdir(path: str):
    fs = FileSystem(path)
    if fs.fs is None:
        return sorted(os.listdir(path))
    # detail=False: fsspec ls() defaults to detail dicts, not path strings
    return sorted(
        os.path.basename(p.rstrip("/")) for p in fs.fs.ls(path, detail=False)
    )


def open_file(path: str, mode: str = "rb"):
    return FileSystem(path).open(path, mode)


def save_npy(path: str, arr) -> None:
    import numpy as np

    with open_file(path, "wb") as f:
        np.save(f, np.asarray(arr))


def load_npy(path: str):
    import numpy as np

    fs = FileSystem(path)
    if fs.fs is None:
        return np.load(path)
    import io as _io

    return np.load(_io.BytesIO(fs.read(path)))


def save_npz(path: str, **arrays) -> None:
    import numpy as np

    with open_file(path, "wb") as f:
        np.savez(f, **arrays)


def load_npz(path: str):
    import numpy as np

    fs = FileSystem(path)
    if fs.fs is None:
        return np.load(path)
    import io as _io

    # npz members need random access; buffer remote bytes
    return np.load(_io.BytesIO(fs.read(path)))
