"""A minimal in-repo Ray API (actors only), used when the real `ray`
package is absent.

Ref: srt/ray/ uses Ray strictly for ACTOR LIFECYCLE — scheduler
processes are created/supervised/killed through Ray while ZMQ moves all
data. That narrow surface (`remote`, `.remote()`, `get`, `kill`,
`init`, `shutdown`) is what this module provides, backed by spawned
multiprocessing processes with a pipe RPC. It is a real process-level
implementation (not a mock): actors live in their own interpreter, as
they would under Ray, so TPU-runtime isolation semantics hold. The
reference keeps an equivalent shim at test/observability/fake_ray.py.
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
import threading
from concurrent.futures import Future
from typing import Any, Dict

_initialized = False
_actors = []


def init(*args, **kwargs):  # noqa: D103 - ray.init signature compat
    global _initialized
    _initialized = True
    return {"backend": "fake"}


def is_initialized() -> bool:
    return _initialized


def shutdown():
    global _initialized
    for a in list(_actors):
        try:
            kill(a)
        except Exception:  # noqa: BLE001
            pass
    _initialized = False


class ObjectRef:
    def __init__(self, future: Future):
        self._future = future

    def result(self, timeout=None):
        return self._future.result(timeout)


def get(ref, timeout: float | None = None):
    if isinstance(ref, list):
        return [get(r, timeout) for r in ref]
    return ref.result(timeout)


def kill(actor, no_restart: bool = True):
    actor._terminate()
    if actor in _actors:
        _actors.remove(actor)


def _actor_main(cls_path: str, conn, init_args, init_kwargs):
    import importlib

    mod_name, qual = cls_path.rsplit(":", 1)
    cls = importlib.import_module(mod_name)
    for part in qual.split("."):
        cls = getattr(cls, part)
    try:
        inst = cls(*init_args, **init_kwargs)
        conn.send(("__init__", True, None))
    except Exception as e:  # noqa: BLE001
        conn.send(("__init__", False, repr(e)))
        return
    while True:
        try:
            msg = conn.recv()
        except (EOFError, OSError):
            return
        if msg is None:
            return
        call_id, method, args, kwargs = msg
        try:
            result = getattr(inst, method)(*args, **kwargs)
            conn.send((call_id, True, result))
        except Exception as e:  # noqa: BLE001
            conn.send((call_id, False, repr(e)))


class _MethodProxy:
    def __init__(self, handle: "ActorHandle", name: str):
        self._handle = handle
        self._name = name

    def remote(self, *args, **kwargs) -> ObjectRef:
        return self._handle._call(self._name, args, kwargs)


class ActorHandle:
    def __init__(self, cls_path: str, args, kwargs):
        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(
            target=_actor_main, args=(cls_path, child, args, kwargs),
            daemon=True,
        )
        self._proc.start()
        child.close()
        self._pending: Dict[int, Future] = {}
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        init_fut: Future = Future()
        self._pending[0] = init_fut
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        ok = init_fut.result(timeout=120)
        if ok is not True:
            raise RuntimeError(f"actor init failed: {ok}")
        _actors.append(self)

    def _read_loop(self):
        while True:
            try:
                call_id, ok, payload = self._conn.recv()
            except (EOFError, OSError):
                with self._lock:
                    pending, self._pending = self._pending, {}
                for fut in pending.values():
                    if not fut.done():
                        fut.set_exception(RuntimeError("actor died"))
                return
            if call_id == "__init__":
                fut = self._pending.pop(0)
                fut.set_result(True if ok else payload)
                continue
            with self._lock:
                fut = self._pending.pop(call_id, None)
            if fut is None:
                continue
            if ok:
                fut.set_result(payload)
            else:
                fut.set_exception(RuntimeError(payload))

    def _call(self, method: str, args, kwargs) -> ObjectRef:
        fut: Future = Future()
        with self._lock:
            call_id = next(self._ids)
            self._pending[call_id] = fut
        try:
            self._conn.send((call_id, method, args, kwargs))
        except (BrokenPipeError, OSError):
            fut.set_exception(RuntimeError("actor died"))
        return ObjectRef(fut)

    def _terminate(self):
        try:
            self._conn.send(None)
        except Exception:  # noqa: BLE001
            pass
        self._proc.terminate()
        self._proc.join(timeout=5)

    def is_alive(self) -> bool:
        return self._proc.is_alive()

    def __getattr__(self, name: str) -> _MethodProxy:
        if name.startswith("_"):
            raise AttributeError(name)
        return _MethodProxy(self, name)


class _RemoteClass:
    def __init__(self, cls, options: Dict[str, Any] | None = None):
        self._cls = cls
        self._options = options or {}

    def options(self, **kwargs) -> "_RemoteClass":
        return _RemoteClass(self._cls, {**self._options, **kwargs})

    def remote(self, *args, **kwargs) -> ActorHandle:
        cls_path = f"{self._cls.__module__}:{self._cls.__qualname__}"
        return ActorHandle(cls_path, args, kwargs)


def remote(cls=None, **_options):
    if cls is None:
        return lambda c: _RemoteClass(c, _options)
    return _RemoteClass(cls)
