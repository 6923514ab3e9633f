"""Remote weight/KV connectors (ref srt/connector/).

`create_remote_connector("s3://bucket/path")` returns a connector that
can stream model weights (`weight_iterator`) or mirror files into a
local dir (`pull_files`). The file:// connector is fully functional;
s3/redis/azure gate on their client libraries (not in this image) with
an informative error, keeping the URL scheme surface of the reference
(`srt/connector/__init__.py:75`).
"""

from __future__ import annotations

import enum
import glob as _glob
import os
import shutil
import tempfile
from abc import ABC, abstractmethod
from typing import Generator, List, Optional, Tuple

import numpy as np


class ConnectorType(str, enum.Enum):
    FS = "filesystem"
    KV = "KV store"


class BaseConnector(ABC):
    """URL forms (ref srt/connector/base_connector.py:13):
    fs:  <scheme>://<path>/<filename>
    kv:  <scheme>://<host>:<port>/<model>/keys/<key>"""

    connector_type = ConnectorType.FS
    # Class-level default so __del__ stays safe when a subclass __init__
    # raises before calling super().__init__ (e.g. a gated client import).
    closed = False
    local_dir = ""

    def __init__(self, url: str):
        self.url = url
        self.closed = False
        self.local_dir = tempfile.mkdtemp(prefix="sgl_connector_")

    def get_local_dir(self) -> str:
        return self.local_dir

    @abstractmethod
    def weight_iterator(
        self, rank: int = 0
    ) -> Generator[Tuple[str, np.ndarray], None, None]:
        ...

    @abstractmethod
    def pull_files(
        self,
        allow_pattern: Optional[List[str]] = None,
        ignore_pattern: Optional[List[str]] = None,
    ) -> None:
        ...

    def close(self):
        if self.closed:
            return
        self.closed = True
        if self.local_dir and os.path.exists(self.local_dir):
            shutil.rmtree(self.local_dir, ignore_errors=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, tb):
        self.close()

    def __del__(self):
        self.close()


def _iter_safetensors(path: str):
    from safetensors import safe_open

    for f in sorted(_glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


class FileConnector(BaseConnector):
    """file://<abs-path> — local directory source (fully functional)."""

    def __init__(self, url: str):
        super().__init__(url)
        self.path = url[len("file://"):]

    def weight_iterator(self, rank: int = 0):
        yield from _iter_safetensors(self.path)

    def pull_files(self, allow_pattern=None, ignore_pattern=None):
        import fnmatch

        for root, _, files in os.walk(self.path):
            for fn in files:
                rel = os.path.relpath(os.path.join(root, fn), self.path)
                if allow_pattern and not any(
                    fnmatch.fnmatch(rel, pat) for pat in allow_pattern
                ):
                    continue
                if ignore_pattern and any(
                    fnmatch.fnmatch(rel, pat) for pat in ignore_pattern
                ):
                    continue
                dst = os.path.join(self.local_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(os.path.join(root, fn), dst)


class _GatedConnector(BaseConnector):
    """Scheme recognized, client library absent from this image."""

    required = ""

    def __init__(self, url: str):
        raise ImportError(
            f"connector scheme {url.split('://')[0]}:// needs the "
            f"'{self.required}' client, which is not in this image "
            "(zero-egress); use file:// or install it in deployment"
        )

    def weight_iterator(self, rank: int = 0):  # pragma: no cover
        ...

    def pull_files(self, allow_pattern=None, ignore_pattern=None
                   ):  # pragma: no cover
        ...


class S3Connector(_GatedConnector):
    required = "boto3"


class RedisConnector(_GatedConnector):
    required = "redis"
    connector_type = ConnectorType.KV


class AzureConnector(_GatedConnector):
    required = "azure-storage-blob"


class RemoteInstanceConnector(_GatedConnector):
    """Engine-to-engine weight clone (ref remote_instance.py) — needs a
    live peer transfer channel; use the RL distributed weight-sync path
    (update_weights_from_distributed) instead on TPU."""

    required = "remote instance transfer channel"


SCHEMES = {
    "file": FileConnector,
    "s3": S3Connector,
    "redis": RedisConnector,
    "azure": AzureConnector,
    "instance": RemoteInstanceConnector,
}


def create_remote_connector(url: str) -> BaseConnector:
    scheme = url.split("://", 1)[0].lower()
    if scheme not in SCHEMES:
        raise ValueError(f"unknown connector scheme: {scheme}://")
    return SCHEMES[scheme](url)
