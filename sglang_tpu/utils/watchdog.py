"""Watchdogs: child-process liveness + scheduler hang detection.

Ref: srt/utils/watchdog.py:166 (SubprocessWatchdog) and the scheduler soft
watchdog (srt/managers/scheduler.py:1228).
"""

from __future__ import annotations

import logging
import os
import signal
import threading
import time
from typing import List

logger = logging.getLogger(__name__)


class SubprocessWatchdog:
    """Kill the whole process tree when any watched child dies."""

    def __init__(self, procs: List, poll_interval: float = 2.0):
        self.procs = procs
        self.poll_interval = poll_interval
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="subprocess-watchdog"
        )

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def _loop(self) -> None:
        while not self._stop.wait(self.poll_interval):
            for p in self.procs:
                alive = p.is_alive() if hasattr(p, "is_alive") else True
                if not alive:
                    logger.error(
                        "child %s died (exitcode=%s); terminating server",
                        getattr(p, "name", p),
                        getattr(p, "exitcode", "?"),
                    )
                    os.kill(os.getpid(), signal.SIGTERM)
                    return


class SoftWatchdog:
    """Detect a stuck event loop: `pet()` must be called within timeout."""

    def __init__(self, timeout: float = 300.0, on_hang=None):
        self.timeout = timeout
        self.last_pet = time.monotonic()
        self.on_hang = on_hang or self._default_hang
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="soft-watchdog"
        )

    def start(self) -> None:
        self._thread.start()

    def pet(self) -> None:
        self.last_pet = time.monotonic()

    def stop(self) -> None:
        self._stop.set()

    def _default_hang(self) -> None:
        import faulthandler

        logger.error("scheduler hang detected (> %.0fs); dumping stacks",
                     self.timeout)
        faulthandler.dump_traceback()

    def _loop(self) -> None:
        while not self._stop.wait(min(self.timeout / 4, 30)):
            if time.monotonic() - self.last_pet > self.timeout:
                self.on_hang()
                self.last_pet = time.monotonic()
