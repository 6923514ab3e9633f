"""Weight-cache daemon: host-preprocessed weights pinned in shared memory.

Ref: srt/weight_cache/daemon.py (WeightCacheDaemon: load -> export CUDA
IPC handles -> serve over Unix socket -> SIGTERM cleanup). TPU redesign
rationale in weight_cache/__init__.py: the daemon runs the full HOST
pipeline once — checkpoint parse, fusion assembly
(model_exec/weight_loader.py assemble_host_buffers), post_load hooks,
host quantization (layers/base.py host_materialize) — and pins the final
storage-dtype arrays in one POSIX shm segment. Engines attach by name
from the manifest and device_put with their own shardings.

Usage:
    python -m sglang_tpu.weight_cache.daemon \
        --model-path /path/to/model --quantization int8

The daemon needs no TPU (JAX_PLATFORMS=cpu is forced): everything it
does is numpy on host.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import socket
import sys
import time
from multiprocessing import shared_memory
from typing import Any, Dict, Tuple

import numpy as np

from sglang_tpu.weight_cache.protocol import (
    CacheConfig,
    cache_digest,
    cleanup_stale_files,
    get_ready_path,
    get_socket_path,
    make_config,
    recv_msg,
    send_msg,
)

logger = logging.getLogger(__name__)

_ALIGN = 128  # byte alignment per entry (TPU-friendly lane multiple)

# A client exchange is a config dict + manifest; one hung peer must not
# stall other engines (ref daemon.py CLIENT_CONNECTION_TIMEOUT).
CLIENT_CONNECTION_TIMEOUT = 30.0


def build_host_entries(model, specs, model_path: str):
    """Full host pipeline -> {entry_name: (final np array, PartitionSpec)}.

    Exactly the arrays load_model_weights would device_put, in the same
    storage dtypes (quantized int8/f8 + qscale companions included).
    """
    from sglang_tpu.layers.base import host_materialize
    from sglang_tpu.model_exec.weight_loader import assemble_host_buffers

    buffers = assemble_host_buffers(model, specs, model_path)
    entries: Dict[str, Tuple[np.ndarray, Any]] = {}
    missing = []
    for pname in sorted(specs):
        spec = specs[pname]
        if pname not in buffers:
            if spec.init_value is not None:
                arr = np.asarray(spec.init_value).astype(np.dtype(spec.dtype))
                entries[pname] = (arr, spec.spec)
                continue
            missing.append(pname)
            continue
        buf = buffers.pop(pname)
        if spec.post_load is not None:
            buf = spec.post_load(buf)
        for k, (a, pspec) in host_materialize(pname, spec, buf).items():
            entries[k] = (np.ascontiguousarray(a), pspec)
    if missing:
        raise ValueError(
            f"missing weights for params: {missing[:8]}... ({len(missing)})"
        )
    return entries


def pin_entries_to_shm(entries, shm_name: str):
    """Copy entries into one named shm segment; return (shm, manifest)."""
    sizes = {k: a.nbytes for k, (a, _) in entries.items()}
    total = 0
    offsets = {}
    for k in sorted(entries):
        offsets[k] = total
        total += (sizes[k] + _ALIGN - 1) // _ALIGN * _ALIGN
    shm = shared_memory.SharedMemory(
        name=shm_name, create=True, size=max(total, 1)
    )
    manifest: Dict[str, Any] = {}
    for k, (a, _pspec) in entries.items():
        view = np.ndarray(a.shape, dtype=a.dtype, buffer=shm.buf,
                          offset=offsets[k])
        view[...] = a
        manifest[k] = {
            "offset": offsets[k],
            "shape": list(a.shape),
            "dtype": np.dtype(a.dtype).name,
        }
    return shm, manifest


class WeightCacheDaemon:
    """Holds one model's preprocessed host weights; serves the manifest."""

    def __init__(self, model_path: str, quantization=None, dtype="auto",
                 context_length=None, trust_remote_code=False):
        from sglang_tpu.configs.model_config import ModelConfig
        from sglang_tpu.models.registry import get_model_class
        from sglang_tpu.quantization import set_quant_method

        self.model_path = model_path
        t0 = time.perf_counter()
        config = ModelConfig.from_model_path(
            model_path, dtype=dtype, context_length=context_length,
            trust_remote_code=trust_remote_code,
        )
        set_quant_method(quantization)
        model = get_model_class(config.architectures)(config)
        self.specs = model.param_specs()
        self.config = make_config(model_path, self.specs)
        entries = build_host_entries(model, self.specs, model_path)
        self._shm_name = f"sgltpu_wc_{cache_digest(model_path)}"
        try:
            # A previous daemon that died without cleanup leaves the
            # segment; reclaim the name.
            stale = shared_memory.SharedMemory(name=self._shm_name)
            stale.close()
            stale.unlink()
        except FileNotFoundError:
            pass
        self.shm, self.manifest = pin_entries_to_shm(entries, self._shm_name)
        del entries
        logger.info(
            "weight cache built: %d entries, %.2f GiB pinned in %s (%.1fs)",
            len(self.manifest), self.shm.size / (1 << 30), self._shm_name,
            time.perf_counter() - t0,
        )
        self._sock = None
        self._running = False

    # ------------------------------------------------------------- serving
    def serve_forever(self) -> None:
        sock_path = get_socket_path(self.model_path)
        ready_path = get_ready_path(self.model_path)
        cleanup_stale_files(self.model_path)
        if os.path.exists(sock_path):
            raise RuntimeError(
                f"socket {sock_path} exists — another daemon is serving "
                f"this model"
            )
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(sock_path)
        self._sock.listen(16)
        with open(ready_path, "w") as f:
            json.dump({"pid": os.getpid(), "shm": self._shm_name,
                       "config": self.config.to_dict()}, f)
        logger.info("serving weight cache on %s", sock_path)
        self._running = True
        try:
            while self._running:
                try:
                    conn, _ = self._sock.accept()
                except OSError:
                    break  # socket closed by shutdown
                try:
                    conn.settimeout(CLIENT_CONNECTION_TIMEOUT)
                    self._handle(conn)
                except Exception:  # noqa: BLE001 — one bad peer, keep serving
                    logger.warning("client exchange failed", exc_info=True)
                finally:
                    conn.close()
        finally:
            self.shutdown()

    def _handle(self, conn: socket.socket) -> None:
        msg = recv_msg(conn)
        if msg.get("type") == "shutdown":
            send_msg(conn, {"status": "ok"})
            self._running = False
            return
        theirs = CacheConfig.from_dict(msg["config"])
        if not self.config.matches(theirs):
            diff = [
                k for k in ("model_path", "ckpt_hash", "spec_hash", "version")
                if getattr(self.config, k) != getattr(theirs, k)
            ]
            send_msg(conn, {"status": "mismatch", "fields": diff,
                            "daemon_config": self.config.to_dict()})
            return
        send_msg(conn, {"status": "match", "shm": self._shm_name,
                        "manifest": self.manifest})

    def shutdown(self) -> None:
        self._running = False
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None
        for p in (get_socket_path(self.model_path),
                  get_ready_path(self.model_path)):
            try:
                os.unlink(p)
            except OSError:
                pass
        try:
            self.shm.close()
            self.shm.unlink()
        except (OSError, FileNotFoundError):
            pass


def main(argv=None) -> None:
    # Host-only work: pin CPU BEFORE anything initializes jax. The env
    # var alone is not enough — the axon sitecustomize force-updates
    # jax_platforms at interpreter start (see tests/conftest.py), and
    # grabbing the (possibly busy) TPU would both stall this daemon and
    # fight the engine for the chip.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--dtype", default="auto")
    ap.add_argument("--context-length", type=int, default=None)
    ap.add_argument("--trust-remote-code", action="store_true")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    daemon = WeightCacheDaemon(
        args.model_path, quantization=args.quantization, dtype=args.dtype,
        context_length=args.context_length,
        trust_remote_code=args.trust_remote_code,
    )

    def _term(signum, frame):  # noqa: ARG001
        daemon.shutdown()
        sys.exit(0)

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)
    daemon.serve_forever()


if __name__ == "__main__":
    main()
