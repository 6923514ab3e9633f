"""Fake (in-process) PD transfer backend for tests.

Ref: srt/disaggregation/fake/conn.py — exercises the full PD flow
(including the chunked in-flight wire protocol) without RDMA/DCN.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

from sglang_tpu.disaggregation.base import (
    BootstrapServer,
    ChunkAssembler,
    KVHandoff,
    KVMessage,
    KVReceiver,
    KVSender,
)

_STORE: Dict[str, KVHandoff] = {}
_ASSEMBLER = ChunkAssembler()
_SENT_LOG: List[KVMessage] = []  # tests inspect the wire traffic
_LOCK = threading.Lock()


def reset_store() -> None:
    global _ASSEMBLER
    with _LOCK:
        _STORE.clear()
        _SENT_LOG.clear()
        _ASSEMBLER = ChunkAssembler()


def sent_messages() -> List[KVMessage]:
    with _LOCK:
        return list(_SENT_LOG)


class FakeKVSender(KVSender):
    def send(self, msg: KVMessage) -> None:
        with _LOCK:
            _SENT_LOG.append(msg)
            done = _ASSEMBLER.add(msg)
            if done is not None:
                _STORE[done.room] = done


class FakeKVReceiver(KVReceiver):
    def poll(self, room: str) -> Optional[KVHandoff]:
        with _LOCK:
            return _STORE.pop(room, None)

    def poll_any(self) -> Optional[KVHandoff]:
        with _LOCK:
            if not _STORE:
                return None
            room = next(iter(_STORE))
            return _STORE.pop(room)


class FakeBootstrapServer(BootstrapServer):
    def register(self, room: str) -> None:
        pass
