"""Prefill/decode disaggregation: transfer interfaces.

Ref: srt/disaggregation/base/conn.py:97-243 (BaseKVManager/Sender/
Receiver/BootstrapServer). TPU-native payload: page-granular KV bytes
(numpy, pool-native dtype) staged through the same gather/copy kernels as
HiCache; engines pair via a bootstrap "room" key. Backends: fake
(in-process, tests) now; DCN tensor-transfer for real multi-slice later.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class KVHandoff:
    """One request's prefill result shipped to the decode engine."""

    room: str
    token_ids: List[int]  # prompt tokens covered by the KV (page-aligned)
    kv_pages: np.ndarray  # [K, L, ps, 2, F] pool-native dtype
    first_token: int
    first_logprob: Optional[float] = None


class KVSender(abc.ABC):
    @abc.abstractmethod
    def send(self, handoff: KVHandoff) -> None: ...


class KVReceiver(abc.ABC):
    @abc.abstractmethod
    def poll(self, room: str) -> Optional[KVHandoff]: ...


class BootstrapServer(abc.ABC):
    """Pairs prefill and decode instances (room registry)."""

    @abc.abstractmethod
    def register(self, room: str) -> None: ...
