"""KV cache event publishing for external cache-aware routers.

Ref: srt/mem_cache/storage/kv_events (--kv-events-config): the engine
publishes BlockStored / BlockRemoved / AllBlocksCleared events so a router
can mirror each worker's prefix-cache content and route by predicted hit
rate without polling. Events ride a ZMQ PUB socket as JSON lines; block
hashes are a rolling hash over page-aligned token chunks so routers can
key blocks identically across workers.
"""

from __future__ import annotations

import hashlib
import json
import logging
import threading
import time
from typing import List, Optional

logger = logging.getLogger(__name__)


def block_hashes(token_ids: List[int], page_size: int) -> List[str]:
    """Rolling per-page hashes: h_i = H(h_{i-1} || tokens_i)."""
    out = []
    parent = ""
    for i in range(0, (len(token_ids) // page_size) * page_size, page_size):
        chunk = token_ids[i : i + page_size]
        parent = hashlib.sha1(
            (parent + ",".join(map(str, chunk))).encode()
        ).hexdigest()[:16]
        out.append(parent)
    return out


class KVEventPublisher:
    def __init__(self, config: str | dict):
        if isinstance(config, str):
            config = json.loads(config)
        self.endpoint = config.get("endpoint", "tcp://*:5557")
        self.topic = config.get("topic", "kv-events")
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.PUB)
        self._sock.bind(self.endpoint)
        self._lock = threading.Lock()
        self._seq = 0

    def _publish(self, event_type: str, payload: dict) -> None:
        self._seq += 1
        msg = {
            "type": event_type,
            "seq": self._seq,
            "ts": time.time(),
            **payload,
        }
        with self._lock:
            try:
                self._sock.send_multipart(
                    [self.topic.encode(), json.dumps(msg).encode()],
                    flags=1,  # NOBLOCK: never stall the scheduler
                )
            except Exception:  # noqa: BLE001
                pass

    def block_stored(self, hashes: List[str], token_ids: List[int],
                     parent: Optional[str]) -> None:
        self._publish(
            "BlockStored",
            {"block_hashes": hashes, "parent_block_hash": parent,
             "token_ids": token_ids},
        )

    def block_removed(self, hashes: List[str]) -> None:
        self._publish("BlockRemoved", {"block_hashes": hashes})

    def all_blocks_cleared(self) -> None:
        self._publish("AllBlocksCleared", {})

    def close(self) -> None:
        try:
            self._sock.close(0)
        except Exception:  # noqa: BLE001
            pass
