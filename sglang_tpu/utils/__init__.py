"""Common helpers (host-side).

Counterpart of sglang's srt/utils/common.py grab-bag, kept minimal and
TPU-flavored (bucketing helpers for static-shape jit programs).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import socket
import threading
import time
from typing import Any, Iterable, Sequence

logger = logging.getLogger("sglang_tpu")


def assert_jax_platform() -> None:
    """Re-assert the JAX_PLATFORMS env var over plugin sitecustomize hooks.

    Some TPU plugin bootstraps call jax.config.update("jax_platforms", ...)
    at interpreter start, clobbering the user's env selection (e.g. CPU test
    meshes). Call this before first jax use in every process entrypoint.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want and "," not in want and want != "axon":
        import jax

        jax.config.update("jax_platforms", want)


def get_bool_env_var(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("1", "true", "yes", "on")


def get_int_env_var(name: str, default: int) -> int:
    v = os.getenv(name)
    return int(v) if v is not None else default


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


DETERMINISTIC_BUCKETS = False  # set via enable_deterministic_inference


def set_deterministic_buckets(on: bool) -> None:
    """Deterministic (batch-invariant) mode: batch-size and token-count
    buckets pad to their LARGEST value, so a request's padded row shape —
    and therefore XLA's reduction tiling and its numerics — never depends
    on what it is co-batched with (ref
    --enable-deterministic-inference / batch invariance). The PAGE bucket
    stays dynamic (pinning it would square the attention working set):
    numerics can still shift at context-length bucket boundaries, which
    depend only on the request itself except when a longer co-batched
    sequence widens the shared table — documented caveat.
    """
    global DETERMINISTIC_BUCKETS
    DETERMINISTIC_BUCKETS = on


def bucketize(x: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= x. Buckets must be sorted ascending.

    Static-shape jit programs are compiled once per bucket; this is the
    TPU-native replacement for CUDA-graph capture sizes
    (reference: srt/model_executor/runner/base_cuda_graph_runner.py).
    """
    for b in buckets:
        if b >= x:
            return b
    return buckets[-1]


def make_buckets(lo: int, hi: int, *, mult: float = 2.0) -> list[int]:
    """Geometric bucket ladder [lo, ..., hi], powers-of-two style."""
    out = []
    b = lo
    while b < hi:
        out.append(b)
        b = max(b + 1, int(b * mult))
    out.append(hi)
    return out


def find_free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def configure_logger(level: str = "info") -> None:
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="[%(asctime)s %(process)d %(name)s %(levelname)s] %(message)s",
        datefmt="%H:%M:%S",
    )


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0


_UID_LOCK = threading.Lock()
_UID_COUNTER = [0]


def gen_uid(prefix: str = "req") -> str:
    with _UID_LOCK:
        _UID_COUNTER[0] += 1
        n = _UID_COUNTER[0]
    return f"{prefix}-{os.getpid()}-{n}-{int(time.time() * 1e3) % 100000}"


def dataclass_to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: dataclass_to_dict(v) for k, v in dataclasses.asdict(obj).items()}
    return obj


def flatten(xs: Iterable[Iterable[Any]]) -> list[Any]:
    return [x for sub in xs for x in sub]
