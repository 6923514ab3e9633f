"""DataParallelController: dispatch requests across dp_size schedulers.

Ref: srt/managers/data_parallel_controller.py:132 (DataParallelController,
round_robin_scheduler:754, shortest-queue policy :159). Sits between the
TokenizerManager and N scheduler workers; generation requests are routed by
policy, control messages are handled by worker 0 (flush broadcast to all).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List

import zmq

from sglang_tpu.managers.io_struct import (
    AbortReq,
    FlushCacheReq,
    SchedulerReady,
    TokenizedGenerateReqInput,
)
from sglang_tpu.managers.zmq_utils import make_socket, recv_pyobj, send_pyobj

logger = logging.getLogger(__name__)


class DataParallelController:
    def __init__(self, server_args, port_args, worker_addrs: List[str]):
        self.server_args = server_args
        self.recv_sock = make_socket(port_args.scheduler_ipc, zmq.PULL, bind=True)
        self.workers = [
            make_socket(addr, zmq.PUSH, bind=False) for addr in worker_addrs
        ]
        self.policy = getattr(server_args, "load_balance_method", "round_robin")
        self._rr = 0
        # queue-depth estimate per worker (reqs in - finishes unseen here;
        # shortest_queue uses in-flight count decremented on abort only, so
        # it degrades to least-dispatched — the reference's default too)
        self.dispatched = [0] * len(self.workers)
        self.rid_to_worker = {}

    def _pick(self) -> int:
        if self.policy == "shortest_queue":
            return min(range(len(self.workers)), key=lambda i: self.dispatched[i])
        i = self._rr
        self._rr = (self._rr + 1) % len(self.workers)
        return i

    def dispatch(self, msg) -> None:
        if isinstance(msg, TokenizedGenerateReqInput):
            i = self._pick()
            self.dispatched[i] += 1
            self.rid_to_worker[msg.rid] = i
            send_pyobj(self.workers[i], msg)
        elif isinstance(msg, AbortReq):
            i = self.rid_to_worker.get(msg.rid, 0)
            send_pyobj(self.workers[i], msg)
        elif isinstance(msg, FlushCacheReq):
            for w in self.workers:
                send_pyobj(w, msg)
        else:
            # control RPCs answered by worker 0
            send_pyobj(self.workers[0], msg)

    def event_loop(self) -> None:
        while True:
            msg = recv_pyobj(self.recv_sock)
            if msg is None:
                return
            self.dispatch(msg)


def run_dp_controller(server_args, port_args, worker_addrs: List[str]):
    DataParallelController(server_args, port_args, worker_addrs).event_loop()
