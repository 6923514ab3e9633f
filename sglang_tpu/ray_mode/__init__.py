"""Ray mode: scheduler/detokenizer lifecycle managed by Ray actors.

Ref: srt/ray/{engine.py,scheduler_actor.py,data_parallel_controller.py}
— Ray owns process placement/supervision; ZMQ remains the data plane.
The real `ray` package is used when importable; otherwise the in-repo
process-backed implementation (fake_ray.py) provides the same actor
surface, matching the reference's test shim.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def get_ray(backend: str = "auto"):
    """Return the ray module to use. backend: auto | ray | fake."""
    if backend in ("auto", "ray"):
        try:
            import ray  # noqa: F401

            return ray
        except ImportError:
            if backend == "ray":
                raise
    if backend in ("auto", "fake"):
        from sglang_tpu.ray_mode import fake_ray

        return fake_ray
    raise ValueError(f"unknown ray backend {backend!r}")
