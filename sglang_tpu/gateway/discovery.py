"""Worker discovery: static lists, file-watch, and HTTP polling.

Behavioral reference: sgl-model-gateway/src/service_discovery (k8s
watch-based discovery with pod-label selectors, prefill/decode role
labels, and bootstrap-port annotations). Zero-egress image, so the k8s
client is replaced by the two transports that need no cluster: a watched
JSON file (the analog of a watch stream — e.g. written by an operator or
a configmap mount) and a polled HTTP endpoint. Both resolve to the same
`WorkerSpec` records (url + role + optional bootstrap url).
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import logging
import os
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class WorkerSpec:
    url: str
    role: str = "regular"  # regular | prefill | decode
    bootstrap_url: Optional[str] = None  # decode engines: PD bootstrap server
    api_key: Optional[str] = None

    @staticmethod
    def parse(obj) -> "WorkerSpec":
        if isinstance(obj, str):
            return WorkerSpec(url=obj.rstrip("/"))
        return WorkerSpec(
            url=str(obj["url"]).rstrip("/"),
            role=obj.get("role", "regular"),
            bootstrap_url=obj.get("bootstrap_url"),
            api_key=obj.get("api_key"),
        )


class StaticDiscovery:
    """Fixed worker list (the --workers flag)."""

    def __init__(self, specs: List[WorkerSpec]):
        self.specs = specs

    async def run(self, sync: Callable[[List[WorkerSpec]], None]) -> None:
        sync(self.specs)


class FileDiscovery:
    """Watches a JSON file: {"workers": [{"url": ..., "role": ...}, ...]}.
    Re-syncs on mtime change — the configmap/watch-stream analog."""

    def __init__(self, path: str, interval: float = 2.0):
        self.path = path
        self.interval = interval
        self._mtime = -1.0

    def load(self) -> Optional[List[WorkerSpec]]:
        try:
            mtime = os.path.getmtime(self.path)
        except OSError:
            return None
        if mtime == self._mtime:
            return None
        self._mtime = mtime
        try:
            with open(self.path) as f:
                doc = json.load(f)
        except (OSError, ValueError) as e:
            logger.warning("discovery file %s unreadable: %s", self.path, e)
            return None
        return [WorkerSpec.parse(w) for w in doc.get("workers", [])]

    async def run(self, sync: Callable[[List[WorkerSpec]], None]) -> None:
        while True:
            specs = self.load()
            if specs is not None:
                sync(specs)
            await asyncio.sleep(self.interval)


class HttpDiscovery:
    """Polls an HTTP endpoint returning the same JSON document."""

    def __init__(self, url: str, interval: float = 5.0):
        self.url = url
        self.interval = interval

    async def run(self, sync: Callable[[List[WorkerSpec]], None]) -> None:
        import aiohttp

        async with aiohttp.ClientSession() as session:
            while True:
                try:
                    async with session.get(
                        self.url, timeout=aiohttp.ClientTimeout(total=10)
                    ) as r:
                        doc = await r.json()
                    sync([WorkerSpec.parse(w) for w in doc.get("workers", [])])
                except Exception as e:  # noqa: BLE001
                    logger.warning("discovery poll %s failed: %s", self.url, e)
                await asyncio.sleep(self.interval)
