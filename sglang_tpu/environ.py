"""Typed environment-variable registry (SGLANG_TPU_* / SGLANG_* vars).

Behavioral reference: srt/environ.py — a descriptor-based registry of
~550 typed env fields with parse/get/set/clear and context-manager
overrides, so scattered os.getenv calls are replaced by one audited
surface. Same design, TPU-relevant fields: every field knows its type,
default, and name; `envs.FIELD.get()` parses the process env on each
read (tests can monkeypatch os.environ); `with envs.FIELD.override(v):`
scopes a change.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Any, Optional


class EnvField:
    def __init__(self, default: Any):
        self.default = default
        self.name: Optional[str] = None

    def __set_name__(self, owner, name):
        self.name = name

    def parse(self, value: str) -> Any:
        raise NotImplementedError

    def get(self) -> Any:
        raw = os.getenv(self.name)
        if raw is None:
            return self.default() if callable(self.default) else self.default
        try:
            return self.parse(raw)
        except ValueError:
            import logging

            logging.getLogger(__name__).warning(
                "invalid value %r for %s; using default", raw, self.name
            )
            return self.default() if callable(self.default) else self.default

    def is_set(self) -> bool:
        return self.name in os.environ

    def set(self, value: Any) -> None:
        os.environ[self.name] = str(value)

    def clear(self) -> None:
        os.environ.pop(self.name, None)

    @contextmanager
    def override(self, value: Any):
        old = os.environ.get(self.name)
        self.set(value)
        try:
            yield
        finally:
            if old is None:
                os.environ.pop(self.name, None)
            else:
                os.environ[self.name] = old


class EnvStr(EnvField):
    def parse(self, value: str) -> str:
        return value


class EnvBool(EnvField):
    def parse(self, value: str) -> bool:
        v = value.strip().lower()
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(value)


class EnvInt(EnvField):
    def parse(self, value: str) -> int:
        return int(value)


class EnvFloat(EnvField):
    def parse(self, value: str) -> float:
        return float(value)


def _default_cache_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "sglang_tpu")


class Envs:
    # ---------------------------------------------------------------- paths
    SGLANG_TPU_CACHE_DIR = EnvStr(_default_cache_dir)
    # persistent XLA compile cache (model_exec/model_runner.py)
    SGLANG_TPU_COMPILE_CACHE = EnvStr(
        lambda: os.path.join(_default_cache_dir(), "xla_cache")
    )
    SGLANG_TPU_DISABLE_COMPILE_CACHE = EnvBool(False)

    # ------------------------------------------------------------- logging
    SGLANG_TPU_LOG_LEVEL = EnvStr("info")
    SGLANG_TPU_LOG_STEPS = EnvBool(False)  # per-step scheduler log lines
    SGLANG_TPU_SUPPRESS_JAX_WARNINGS = EnvBool(True)

    # ----------------------------------------------------------- scheduler
    SGLANG_TPU_WATCHDOG_TIMEOUT = EnvFloat(300.0)
    SGLANG_TPU_STEP_TIMEOUT = EnvFloat(120.0)  # soft-hang detector window
    # test-only determinism knob mirrored by --enable-deterministic-inference
    SGLANG_TPU_DETERMINISTIC = EnvBool(False)

    # --------------------------------------------------------------- debug
    SGLANG_TPU_DUMP_DIR = EnvStr("")  # step dumper output (debug_utils)
    SGLANG_TPU_KV_CANARY = EnvBool(False)
    SGLANG_TPU_JAX_PLATFORMS = EnvStr("")  # forwarded to JAX_PLATFORMS
    # virtual device count for CPU-mesh tests
    SGLANG_TPU_HOST_DEVICE_COUNT = EnvInt(0)

    # ------------------------------------------------------------ networking
    SGLANG_TPU_ZMQ_HWM = EnvInt(0)
    SGLANG_TPU_HTTP_TIMEOUT = EnvFloat(3600.0)
    SGLANG_TPU_BOOTSTRAP_TIMEOUT = EnvFloat(120.0)  # PD bootstrap resolve

    # -------------------------------------------------------------- tuning
    SGLANG_TPU_DECODE_BUCKETS = EnvStr("")  # csv override of batch buckets
    SGLANG_TPU_EXTEND_BUCKETS = EnvStr("")
    SGLANG_TPU_MAX_COMPILE_SHAPES = EnvInt(64)
    # ragged-kernel block sizes (ops/attention/pallas_kernels.py)
    SGLANG_TPU_PALLAS_BLOCK_Q = EnvInt(0)
    SGLANG_TPU_PALLAS_BLOCK_KV = EnvInt(0)

    # ------------------------------------------------------------- features
    SGLANG_TPU_ENABLE_METRICS = EnvBool(False)
    SGLANG_TPU_OTLP_ENDPOINT = EnvStr("")
    # plugin modules, comma-separated (sglang_tpu/plugins.py)
    SGLANG_TPU_PLUGINS = EnvStr("")
    SGLANG_TPU_HICACHE_STORAGE = EnvStr("")  # overrides storage backend

    # ---------------------------------------------------- test/CI controls
    SGLANG_TPU_TEST_MODEL_DIR = EnvStr("")
    SGLANG_TPU_CI = EnvBool(False)


envs = Envs()


def iter_fields():
    """(name, field) pairs for docs/diagnostics endpoints."""
    for name in dir(Envs):
        field = getattr(Envs, name)
        if isinstance(field, EnvField):
            yield name, field


def snapshot() -> dict:
    """Current resolved values (for /get_server_info diagnostics)."""
    return {name: field.get() for name, field in iter_fields()}
