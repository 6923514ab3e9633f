"""Ray-actor launch path for the engine's manager processes.

Ref: srt/ray/engine.py (RayEngine._launch_schedulers: one actor per
scheduler rank, placement via Ray, readiness via actor RPC) and
srt/ray/scheduler_actor.py (actor hosts the scheduler event loop; ZMQ
still carries requests/responses). Here each manager (detokenizer, DP
controller, scheduler ranks) becomes one actor whose event loop runs on
a thread inside the actor process; `ready()`/`is_healthy()` RPCs give
the supervisor a liveness probe the plain-subprocess path lacks.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
from typing import List, Tuple

from sglang_tpu.server_args import PortArgs, ServerArgs

logger = logging.getLogger(__name__)


class ManagerActor:
    """Generic actor hosting one manager event loop (ref
    srt/ray/scheduler_actor.py SchedulerActor)."""

    def __init__(self, kind: str, server_args: ServerArgs,
                 port_args: PortArgs, extra: tuple = ()):
        if kind == "scheduler":
            from sglang_tpu.managers.scheduler import run_scheduler as fn
        elif kind == "detokenizer":
            from sglang_tpu.managers.detokenizer_manager import (
                run_detokenizer as fn,
            )
        elif kind == "dp-controller":
            from sglang_tpu.managers.data_parallel_controller import (
                run_dp_controller as fn,
            )
        else:
            raise ValueError(f"unknown manager kind {kind}")
        self.kind = kind
        self._err = None

        def guarded():
            try:
                fn(server_args, port_args, *extra)
            except Exception as e:  # noqa: BLE001
                self._err = repr(e)
                logger.exception("%s actor loop died", kind)

        self._thread = threading.Thread(
            target=guarded, daemon=True, name=f"{kind}-loop"
        )
        self._thread.start()

    def ready(self) -> bool:
        return True

    def is_healthy(self) -> bool:
        return self._thread.is_alive()

    def last_error(self):
        return self._err


class ActorWorker:
    """Adapter giving a Ray actor handle the subprocess-worker surface
    Engine supervises (.name, .is_alive(), .terminate())."""

    def __init__(self, ray_mod, name: str, handle):
        self._ray = ray_mod
        self.name = name
        self.handle = handle

    def is_alive(self) -> bool:
        try:
            # fake_ray handles expose process liveness directly; real
            # ray handles don't have it (AttributeError -> skip).
            proc_alive = getattr(self.handle, "is_alive", None)
            if callable(proc_alive) and proc_alive() is False:
                return False
            return bool(
                self._ray.get(self.handle.is_healthy.remote(), timeout=10)
            )
        except Exception:  # noqa: BLE001
            return False

    def terminate(self):
        try:
            self._ray.kill(self.handle)
        except Exception:  # noqa: BLE001
            pass

    def join(self, timeout=None):
        pass


def launch_managers_ray(
    server_args: ServerArgs,
) -> Tuple[PortArgs, List[ActorWorker]]:
    """Ray-actor analog of entrypoints.engine.launch_managers (multi-
    process branch): same topology, actors instead of mp.Process."""
    from sglang_tpu.ray_mode import get_ray

    ray = get_ray(getattr(server_args, "ray_backend", "auto"))
    if hasattr(ray, "is_initialized") and not ray.is_initialized():
        ray.init(ignore_reinit_error=True)

    port_args = PortArgs.init_new(server_args)
    dp = max(server_args.dp_size, 1)
    actor_cls = ray.remote(ManagerActor)

    specs = [("detokenizer", port_args, ())]
    if dp > 1:
        worker_addrs = [
            f"{port_args.scheduler_ipc}_w{i}" for i in range(dp)
        ]
        specs.append(("dp-controller", port_args, (worker_addrs,)))
        for i, addr in enumerate(worker_addrs):
            wp = dataclasses.replace(port_args, scheduler_ipc=addr)
            specs.append((f"scheduler-{i}", wp, ()))
    else:
        specs.append(("scheduler", port_args, ()))

    workers: List[ActorWorker] = []
    for name, pa, extra in specs:
        kind = "scheduler" if name.startswith("scheduler") else name
        handle = actor_cls.remote(kind, server_args, pa, extra)
        ray.get(handle.ready.remote(), timeout=120)
        workers.append(ActorWorker(ray, name, handle))
    logger.info("ray mode: %d manager actors up (%s)", len(workers),
                getattr(ray, "__name__", "ray"))
    return port_args, workers
