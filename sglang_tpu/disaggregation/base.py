"""Prefill/decode disaggregation: transfer interfaces.

Ref: srt/disaggregation/base/conn.py:97-243 (BaseKVManager/Sender/
Receiver/BootstrapServer). TPU-native payload: page-granular KV bytes
(numpy, pool-native dtype) staged through the same gather/copy kernels as
HiCache; engines pair via a bootstrap "room" key.

Wire protocol (transfer-agnostic): a request's KV travels as one or more
`KVChunk` messages — full pages are shipped AS PREFILL PROGRESSES (ref
early-chunk send, srt/managers/scheduler.py:3598-3601), so the wire time
overlaps the remaining prefill compute; the final chunk carries the
first sampled token and the covered token ids. The receive side runs a
`ChunkAssembler` that files parts by (room, start_page) — idempotent
under resend after a prefill retraction — and yields a complete
`KVHandoff` when the final chunk lands. Any transport that can move a
pickled message (ZMQ today; an RDMA-class DCN transport later) plugs in
by implementing KVSender/KVReceiver.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Dict, List, Optional, Union

import numpy as np


@dataclasses.dataclass
class KVHandoff:
    """One request's assembled prefill result on the decode engine."""

    room: str
    token_ids: List[int]  # prompt tokens covered by the KV (page-aligned)
    kv_pages: np.ndarray  # [K, L, page_bytes] uint8 (mem/page_codec.py)
    first_token: int
    first_logprob: Optional[float] = None
    # hybrid-SWA models: sliding layers' pages (same K slots, own codec)
    swa_pages: Optional[np.ndarray] = None


@dataclasses.dataclass
class KVChunk:
    """A page-aligned slice of a request's KV, shipped mid-prefill."""

    room: str
    start_page: int  # index of kv_pages[0] within the request's pages
    kv_pages: np.ndarray  # [K, L, page_bytes] uint8 (mem/page_codec.py)
    # hybrid-SWA models: sliding layers' pages (same K slots, own codec)
    swa_pages: "Optional[np.ndarray]" = None
    is_last: bool = False
    # Final chunk only:
    token_ids: Optional[List[int]] = None
    first_token: int = -1
    first_logprob: Optional[float] = None


KVMessage = Union[KVHandoff, KVChunk]


class ChunkAssembler:
    """Reassemble KVChunk streams into KVHandoffs (receive side).

    Parts are keyed by start_page so a resend after prefill retraction
    simply overwrites; a legacy whole-request KVHandoff passes through."""

    def __init__(self) -> None:
        self._parts: Dict[str, Dict[int, KVChunk]] = {}

    def add(self, msg: KVMessage) -> Optional[KVHandoff]:
        if isinstance(msg, KVHandoff):
            return msg
        parts = self._parts.setdefault(msg.room, {})
        parts[msg.start_page] = msg
        if not msg.is_last:
            return None
        del self._parts[msg.room]
        chunks = [parts[k] for k in sorted(parts)]
        kv = (
            chunks[0].kv_pages
            if len(chunks) == 1
            else np.concatenate([c.kv_pages for c in chunks], axis=0)
        )
        swa = None
        if chunks[0].swa_pages is not None:
            swa = (
                chunks[0].swa_pages
                if len(chunks) == 1
                else np.concatenate(
                    [c.swa_pages for c in chunks], axis=0)
            )
        return KVHandoff(
            room=msg.room,
            token_ids=list(msg.token_ids or []),
            kv_pages=kv,
            first_token=msg.first_token,
            first_logprob=msg.first_logprob,
            swa_pages=swa,
        )


class KVSender(abc.ABC):
    @abc.abstractmethod
    def send(self, msg: KVMessage) -> None: ...


class KVReceiver(abc.ABC):
    @abc.abstractmethod
    def poll(self, room: str) -> Optional[KVHandoff]: ...

    def poll_any(self) -> Optional[KVHandoff]:
        """Next complete handoff for ANY room (decode-side auto-admission
        loop); backends with room-addressed stores override."""
        return None


class BootstrapServer(abc.ABC):
    """Pairs prefill and decode instances (room registry)."""

    @abc.abstractmethod
    def register(self, room: str) -> None: ...
