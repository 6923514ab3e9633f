"""Optional sidecar process lifecycle (ref srt/entrypoints/sidecar.py:78).

`--sidecar some.module` spawns `some.module.main(argv)` in a separate
process alongside the server, with the engine's gRPC endpoint exported
via SGLANG_TPU_GRPC_ENDPOINT — the hook the reference uses to run a
native gRPC bridge next to the Python engine. A SubprocessWatchdog
brings the server down if the sidecar dies; stop() terminates then
kills on timeout.
"""

from __future__ import annotations

import argparse
import importlib
import logging
import multiprocessing as mp
import os
from typing import List, Optional, Tuple

logger = logging.getLogger(__name__)

GRPC_ENDPOINT_ENV = "SGLANG_TPU_GRPC_ENDPOINT"
_DEFAULT_SHUTDOWN_TIMEOUT = 45.0


def _loopback_host(host: str) -> str:
    if not host or host == "0.0.0.0":
        return "127.0.0.1"
    if host in ("::", "[::]"):
        return "::1"
    return host


def build_sidecar_endpoint(server_args) -> str:
    port = getattr(server_args, "grpc_port", None) or server_args.port
    return f"{_loopback_host(server_args.host)}:{port}"


def _parse_sidecar_args(args: Optional[List[str]]) -> Tuple[List[str], float]:
    parser = argparse.ArgumentParser(add_help=False, allow_abbrev=False)
    parser.add_argument(
        "--sidecar-shutdown-timeout", type=float,
        default=_DEFAULT_SHUTDOWN_TIMEOUT,
    )
    parsed, provider_args = parser.parse_known_args(args or [])
    if parsed.sidecar_shutdown_timeout <= 0:
        raise ValueError("--sidecar-shutdown-timeout must be > 0")
    return provider_args, parsed.sidecar_shutdown_timeout


def _run_sidecar(module_name: str, args: List[str], endpoint: str) -> None:
    os.environ[GRPC_ENDPOINT_ENV] = endpoint
    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # sidecars never own the chip
    try:
        main = getattr(importlib.import_module(module_name), "main")
    except (AttributeError, ImportError) as e:
        raise RuntimeError(
            f"--sidecar requires importable module {module_name!r} with a "
            f"main(argv) function"
        ) from e
    if not callable(main):
        raise RuntimeError(
            f"--sidecar module {module_name!r} main is not callable"
        )
    main(args)


class Sidecar:
    def __init__(self, proc, module_name: str, shutdown_timeout: float):
        self.proc = proc
        self.module_name = module_name
        self.shutdown_timeout = shutdown_timeout
        self._watchdog = None

    def start(self, watch: bool = True) -> None:
        self.proc.start()
        if watch:
            from sglang_tpu.utils.watchdog import SubprocessWatchdog

            self._watchdog = SubprocessWatchdog([self.proc])
            self._watchdog.start()
        logger.info("sidecar %s started pid=%s", self.module_name,
                    self.proc.pid)

    def stop(self) -> None:
        if self._watchdog is not None:
            self._watchdog.stop()
        if self.proc.is_alive():
            self.proc.terminate()
            self.proc.join(timeout=self.shutdown_timeout)
        else:
            self.proc.join(timeout=0)
        if self.proc.is_alive():
            logger.warning("sidecar did not terminate; killing")
            self.proc.kill()
            self.proc.join(timeout=self.shutdown_timeout)


def start_sidecar(server_args, watch: bool = True) -> Sidecar:
    module_name = server_args.sidecar
    assert module_name is not None
    sidecar_args, shutdown_timeout = _parse_sidecar_args(
        server_args.sidecar_args
    )
    endpoint = build_sidecar_endpoint(server_args)
    proc = mp.get_context("spawn").Process(
        name=f"sglang_tpu_sidecar_{module_name}",
        target=_run_sidecar,
        args=(module_name, sidecar_args, endpoint),
    )
    sidecar = Sidecar(proc, module_name, shutdown_timeout=shutdown_timeout)
    sidecar.start(watch=watch)
    return sidecar
