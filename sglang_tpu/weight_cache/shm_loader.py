"""Engine-side weight-cache client: shm manifest -> sharded device params.

Ref: srt/weight_cache/ipc_loader.py (IpcModelLoader). Same fallback
semantics as the reference's client mode:

- socket file missing      -> return None (caller disk-loads)
- connection refused       -> raise (daemon crashed after binding)
- CacheConfig mismatch     -> raise (fingerprint drift is a bug, never
                              silently mask it with a slow disk load)
- mode="daemon"            -> socket missing also raises (the operator
                              asserted a daemon exists)

Unlike CUDA IPC zero-copy, the dependency on the daemon PROCESS ends at
load: on TPU, device_put copies host->HBM; on CPU, JAX's client
zero-copies aligned host buffers, so the engine keeps its shm MAPPING
open for its lifetime (_retain) — on Linux mapped pages stay valid even
after the daemon unlinks the segment and exits, so no liveness polling
thread is needed either way (ref ipc_loader
._DAEMON_LIVENESS_POLL_INTERVAL).
"""

from __future__ import annotations

import logging
import os
import socket
from multiprocessing import shared_memory
from typing import Optional

import jax
import numpy as np

from sglang_tpu.weight_cache.protocol import (
    get_socket_path,
    make_config,
    recv_msg,
    send_msg,
)

logger = logging.getLogger(__name__)

# Mappings kept alive for the process: jax's CPU client aliases aligned
# host buffers on device_put (zero-copy), so closing the shm would unmap
# memory that live params still read. Shared pages cost nothing extra.
_retained = []


def _np_dtype(name: str):
    import ml_dtypes

    for mod in (np, ml_dtypes):
        d = getattr(mod, name, None)
        if d is not None:
            return np.dtype(d)
    return np.dtype(name)


def _entry_pspec(entry: str, specs):
    """Recompute the entry's PartitionSpec from the local spec tree (the
    daemon is mesh-free; shardings are an engine concern)."""
    if entry.endswith("/qscale"):
        from sglang_tpu.quantization import scale_spec

        spec = specs[entry[: -len("/qscale")]]
        return scale_spec(spec.spec, spec.quant_axes, len(spec.shape))
    return specs[entry].spec


def expected_entries(specs):
    for name, spec in specs.items():
        yield name
        if spec.quant_method:
            yield name + "/qscale"


def load_params_via_cache(
    model, specs, mesh_ctx, model_path: str, mode: str = "client"
) -> Optional[dict]:
    """Fetch the manifest from the daemon and device_put every entry.

    Returns None when the daemon is absent in client mode (disk
    fallback); raises on every other failure.
    """
    del model  # layout is fully described by specs
    sock_path = get_socket_path(model_path)
    if not os.path.exists(sock_path):
        if mode == "daemon":
            raise RuntimeError(
                f"--weight-cache-mode daemon but no daemon socket at "
                f"{sock_path}; start one with "
                f"`python -m sglang_tpu.weight_cache.daemon`"
            )
        logger.info("no weight-cache daemon for %s; loading from disk",
                    model_path)
        return None

    cfg = make_config(model_path, specs)
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.settimeout(30.0)
    try:
        sock.connect(sock_path)  # refused -> ConnectionRefusedError (raise)
        send_msg(sock, {"type": "get", "config": cfg.to_dict()})
        reply = recv_msg(sock)
    finally:
        sock.close()
    if reply.get("status") != "match":
        raise RuntimeError(
            f"weight-cache config mismatch on {reply.get('fields')} "
            f"(daemon={reply.get('daemon_config')}, ours={cfg.to_dict()}) — "
            f"restart the daemon with this engine's flags"
        )

    manifest = reply["manifest"]
    shm = shared_memory.SharedMemory(name=reply["shm"])
    try:
        # Python registers attached segments with its resource tracker,
        # which would unlink the DAEMON's segment when this engine exits
        # (CPython gh-82300); the daemon owns the lifetime, not us.
        from multiprocessing import resource_tracker

        resource_tracker.unregister(shm._name, "shared_memory")  # noqa: SLF001
    except Exception:  # noqa: BLE001 — tracker internals vary by version
        pass
    params = {}
    for entry in expected_entries(specs):
        ent = manifest.get(entry)
        if ent is None:
            raise RuntimeError(
                f"manifest missing entry {entry} (spec_hash matched — "
                f"daemon/loader version skew?)"
            )
        view = np.ndarray(
            tuple(ent["shape"]), dtype=_np_dtype(ent["dtype"]),
            buffer=shm.buf, offset=ent["offset"],
        )
        pspec = _entry_pspec(entry, specs)
        if mesh_ctx is not None:
            params[entry] = jax.device_put(
                view, jax.sharding.NamedSharding(mesh_ctx.mesh, pspec)
            )
        else:
            params[entry] = jax.numpy.asarray(view)
    # device_put is async; the shm views must outlive the in-flight
    # copies — and on CPU the final arrays may alias them (zero-copy).
    jax.block_until_ready(list(params.values()))
    _retained.append(shm)
    return params
