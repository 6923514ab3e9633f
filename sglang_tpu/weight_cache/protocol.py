"""Weight-cache wire protocol + compatibility fingerprint.

Ref: srt/weight_cache/protocol.py (CacheConfig + socket framing). The
reference fingerprints (model_path, tp_rank, quant config hash, torch
version, device capability ...) because its cached tensors are
rank-sharded and post-processed by device-dependent branches. Our cached
arrays are FULL host arrays whose bytes are determined entirely by
(checkpoint bytes, spec tree), so the fingerprint is exactly that:
a stat hash of the checkpoint files + a hash of the spec-tree signature
(name/shape/dtype/quant per param). Any flag that changes the materialized
layout (quantization, dtype, pp stacking, redundant experts) changes the
spec signature and turns into a clean MISMATCH instead of serving
garbage — the same property the reference's env stamp buys, derived
instead of enumerated.
"""

from __future__ import annotations

import dataclasses
import glob
import hashlib
import json
import os
import socket
import struct
from typing import Any, Dict

# One daemon per (model, layout) on a host; the digest keys the socket.
SOCKET_TEMPLATE = "/tmp/sglang_tpu_wcache_{digest}.sock"
READY_TEMPLATE = "/tmp/sglang_tpu_wcache_{digest}.ready"

_PROTO_VERSION = 1
_MAX_MSG = 256 << 20  # manifests are ~KBs; refuse absurd frames


@dataclasses.dataclass
class CacheConfig:
    """Compatibility fingerprint between a daemon's cache and an engine."""

    model_path: str  # realpath
    ckpt_hash: str  # sha256 of (file, size, mtime_ns) of checkpoint files
    spec_hash: str  # sha256 of the spec-tree signature
    version: int = _PROTO_VERSION

    def matches(self, other: "CacheConfig") -> bool:
        return dataclasses.asdict(self) == dataclasses.asdict(other)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "CacheConfig":
        return CacheConfig(**d)


def compute_ckpt_hash(model_path: str) -> str:
    """Stat hash (not content hash — 16GB reads would defeat the point)
    over the files the loader actually consumes."""
    pats = ("*.safetensors", "pytorch_model*.bin", "config.json",
            "quantize_config.json", "quantization_config.json")
    h = hashlib.sha256()
    for pat in pats:
        for f in sorted(glob.glob(os.path.join(model_path, pat))):
            st = os.stat(f)
            h.update(
                f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}\n".encode()
            )
    return h.hexdigest()


def compute_spec_hash(specs) -> str:
    """Signature of the materialized layout: everything that changes the
    final host bytes for a given checkpoint."""
    h = hashlib.sha256()
    for name in sorted(specs):
        s = specs[name]
        h.update(
            f"{name}|{tuple(s.shape)}|{str(s.dtype)}|{s.quant_method}|"
            f"{tuple(s.quant_axes)}|{s.post_load is not None}\n".encode()
        )
    return h.hexdigest()


def make_config(model_path: str, specs) -> CacheConfig:
    return CacheConfig(
        model_path=os.path.realpath(model_path),
        ckpt_hash=compute_ckpt_hash(model_path),
        spec_hash=compute_spec_hash(specs),
    )


def cache_digest(model_path: str) -> str:
    """Socket-path key: per model path (layout mismatches are handled by
    the handshake, not by separate sockets)."""
    return hashlib.sha256(
        os.path.realpath(model_path).encode()
    ).hexdigest()[:12]


def get_socket_path(model_path: str) -> str:
    return SOCKET_TEMPLATE.format(digest=cache_digest(model_path))


def get_ready_path(model_path: str) -> str:
    return READY_TEMPLATE.format(digest=cache_digest(model_path))


# ------------------------------------------------------------ framing
def send_msg(sock: socket.socket, obj: Any) -> None:
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack("<I", len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf += chunk
    return buf


def recv_msg(sock: socket.socket) -> Any:
    (n,) = struct.unpack("<I", _recv_exact(sock, 4))
    if n > _MAX_MSG:
        raise ValueError(f"frame too large: {n}")
    return json.loads(_recv_exact(sock, n).decode())


def cleanup_stale_files(model_path: str) -> None:
    """Remove socket/ready files left by a dead daemon (pid no longer
    alive). Ref: protocol.cleanup_stale_daemon_files."""
    ready = get_ready_path(model_path)
    sockp = get_socket_path(model_path)
    pid = None
    try:
        with open(ready) as f:
            pid = json.load(f).get("pid")
    except (OSError, ValueError):
        pass
    if pid is not None:
        try:
            os.kill(pid, 0)
            return  # alive — not stale
        except ProcessLookupError:
            pass
        except PermissionError:
            return
    for p in (ready, sockp):
        try:
            os.unlink(p)
        except OSError:
            pass
