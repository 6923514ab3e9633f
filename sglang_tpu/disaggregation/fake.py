"""Fake (in-process) PD transfer backend for tests.

Ref: srt/disaggregation/fake/conn.py — exercises the full PD flow without
RDMA/DCN.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

from sglang_tpu.disaggregation.base import BootstrapServer, KVHandoff, KVReceiver, KVSender

_STORE: Dict[str, KVHandoff] = {}
_LOCK = threading.Lock()


def reset_store() -> None:
    with _LOCK:
        _STORE.clear()


class FakeKVSender(KVSender):
    def send(self, handoff: KVHandoff) -> None:
        with _LOCK:
            _STORE[handoff.room] = handoff


class FakeKVReceiver(KVReceiver):
    def poll(self, room: str) -> Optional[KVHandoff]:
        with _LOCK:
            return _STORE.pop(room, None)


class FakeBootstrapServer(BootstrapServer):
    def register(self, room: str) -> None:
        pass
