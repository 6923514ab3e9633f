"""Plugin framework: load external modules that extend the registries.

Behavioral reference: srt/plugins/ — sglang loads plugin modules that
register custom models, quantization methods, connectors etc. at server
start. Same contract here: a plugin is any importable module exposing
`sglang_tpu_plugin(registry)`; the registry hands it the extension
points. Activated via --plugins a.b.c,x.y or SGLANG_TPU_PLUGINS.
"""

from __future__ import annotations

import importlib
import logging
from typing import Callable, Dict, List

logger = logging.getLogger(__name__)

ENTRY_POINT = "sglang_tpu_plugin"


class PluginRegistry:
    """Extension points handed to each plugin's entry function."""

    def __init__(self):
        self.loaded: List[str] = []
        self._startup_hooks: List[Callable] = []
        self._request_hooks: List[Callable] = []

    # ------------------------------------------------------ registrations
    def register_model(self, architecture: str, model_cls) -> None:
        """Add/override an architecture in the model zoo."""
        from sglang_tpu.models.registry import register_model_class

        register_model_class(architecture, model_cls)
        logger.info("plugin registered model %s", architecture)

    def register_function_call_detector(self, name: str, detector_cls) -> None:
        from sglang_tpu.function_call.parser import DETECTORS

        DETECTORS[name] = detector_cls
        logger.info("plugin registered function-call detector %s", name)

    def register_storage_backend(self, name: str, factory) -> None:
        """factory(directory, max_bytes) -> tier with put/get."""
        import sglang_tpu.mem.storage as storage_mod

        orig = storage_mod.create_storage_backend

        def patched(backend, directory, max_bytes=8 << 30):
            if backend == name:
                return factory(directory, max_bytes)
            return orig(backend, directory, max_bytes)

        storage_mod.create_storage_backend = patched
        logger.info("plugin registered storage backend %s", name)

    def on_startup(self, fn: Callable) -> None:
        """Called with the ServerArgs after the engine is constructed."""
        self._startup_hooks.append(fn)

    def on_request(self, fn: Callable) -> None:
        """Called with each GenerateReqInput before tokenization."""
        self._request_hooks.append(fn)

    # ------------------------------------------------------------- firing
    def fire_startup(self, server_args) -> None:
        for fn in self._startup_hooks:
            try:
                fn(server_args)
            except Exception:  # noqa: BLE001
                logger.exception("plugin startup hook failed")

    def fire_request(self, gri) -> None:
        for fn in self._request_hooks:
            try:
                fn(gri)
            except Exception:  # noqa: BLE001
                logger.exception("plugin request hook failed")


REGISTRY = PluginRegistry()


def load_plugins(spec: str) -> PluginRegistry:
    """Import each comma-separated module and call its entry function."""
    for name in filter(None, (s.strip() for s in (spec or "").split(","))):
        if name in REGISTRY.loaded:
            continue
        try:
            mod = importlib.import_module(name)
        except ImportError as e:
            logger.error("cannot import plugin %s: %s", name, e)
            continue
        entry = getattr(mod, ENTRY_POINT, None)
        if entry is None:
            logger.error("plugin %s lacks %s()", name, ENTRY_POINT)
            continue
        try:
            entry(REGISTRY)
            REGISTRY.loaded.append(name)
            logger.info("loaded plugin %s", name)
        except Exception:  # noqa: BLE001
            logger.exception("plugin %s entry failed", name)
    return REGISTRY
