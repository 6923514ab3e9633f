"""Waiting-queue ordering policies + prefill admission budget.

Ref: srt/managers/schedule_policy.py (CacheAwarePolicy:195 LPM/DFS-weight,
CacheAgnosticPolicy:202 FCFS/LOF/random, PrefillAdder:490). The radix-match
is done once here and the result is carried on the req so admission doesn't
re-walk the tree.
"""

from __future__ import annotations

import random
from typing import TYPE_CHECKING, List

from sglang_tpu.core.req import Req

if TYPE_CHECKING:
    from sglang_tpu.core.radix_cache import RadixCache

FCFS_FALLBACK_QUEUE_LEN = 128  # ref: schedule_policy.py:286


class SchedulePolicy:
    def __init__(self, policy: str, radix_cache: "RadixCache"):
        self.policy = policy
        self.radix_cache = radix_cache

    def order(self, waiting: List[Req]) -> None:
        """Reorder waiting queue in place; attaches match results to reqs."""
        policy = self.policy
        if policy == "lpm" and len(waiting) > FCFS_FALLBACK_QUEUE_LEN:
            policy = "fcfs"
        if policy in ("lpm", "dfs-weight"):
            for req in waiting:
                mr = self.radix_cache.match_prefix(req.all_ids)
                req._match = mr
            if policy == "lpm":
                waiting.sort(key=lambda r: -r._match.length)
            else:
                # DFS-weight approximation: group by matched node id so
                # shared-prefix requests run adjacently (cache residency).
                waiting.sort(key=lambda r: (id(r._match.node), -r._match.length))
        elif policy == "fcfs":
            for req in waiting:
                req._match = None
            waiting.sort(key=lambda r: r.arrival_time)
        elif policy == "lof":  # longest output first
            for req in waiting:
                req._match = None
            waiting.sort(key=lambda r: -r.sampling_params.max_new_tokens)
        elif policy == "random":
            for req in waiting:
                req._match = None
            random.shuffle(waiting)
        else:
            raise ValueError(f"unknown schedule policy {self.policy}")
        # Priority dominates the policy ordering (stable sort keeps the
        # policy's order within a priority class). Ref:
        # --enable-priority-scheduling, srt/managers/schedule_policy.py.
        if any(getattr(r, "priority", 0) for r in waiting):
            waiting.sort(key=lambda r: -getattr(r, "priority", 0))
