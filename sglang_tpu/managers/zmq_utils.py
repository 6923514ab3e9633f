"""ZMQ plumbing: pickle-over-zmq sockets, inproc (threads) or ipc/tcp
(processes) — one code path for both topologies.

Ref: the reference connects managers with ZMQ + msgspec
(srt/managers/io_struct.py, utils/common get_zmq_socket). Single-process
mode (threads + inproc://) is our addition for tests and the offline
Engine; the default server uses processes + ipc:// exactly like the
reference's 3-process shape.
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import zmq

_INPROC_CTX: Optional[zmq.Context] = None


def get_ctx(addr: str) -> zmq.Context:
    """inproc sockets must share one Context; ipc/tcp get fresh ones."""
    global _INPROC_CTX
    if addr.startswith("inproc://"):
        if _INPROC_CTX is None:
            _INPROC_CTX = zmq.Context()
        return _INPROC_CTX
    return zmq.Context.instance()


def make_socket(addr: str, sock_type: int, bind: bool) -> zmq.Socket:
    ctx = get_ctx(addr)
    sock = ctx.socket(sock_type)
    sock.set_hwm(0)
    if bind:
        sock.bind(addr)
    else:
        sock.connect(addr)
    return sock


def send_pyobj(sock: zmq.Socket, obj: Any, flags: int = 0) -> None:
    sock.send(pickle.dumps(obj, protocol=5), flags=flags)


def recv_pyobj(sock: zmq.Socket, flags: int = 0) -> Any:
    return pickle.loads(sock.recv(flags=flags))


def drain_pyobj(sock: zmq.Socket) -> list:
    """Non-blocking: receive everything currently queued."""
    out = []
    while True:
        try:
            out.append(recv_pyobj(sock, flags=zmq.NOBLOCK))
        except zmq.Again:
            return out
