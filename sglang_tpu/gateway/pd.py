"""PD-pair routing: pick a (prefill, decode) engine pair per request.

Behavioral reference: sgl-model-gateway/src/routers/pd_router (prefill/
decode worker pools, per-pool policies, bootstrap-field injection, and
dual dispatch: the request is POSTed to BOTH engines — the prefill engine
computes KV and publishes it under a bootstrap room, the decode engine
parks the request until the room's KV arrives and then streams tokens).
The gateway streams the decode engine's response to the client and
awaits/reaps the prefill side.
"""

from __future__ import annotations

import dataclasses
import itertools
import random
import uuid
from typing import Dict, List, Optional, Tuple

from sglang_tpu.gateway.discovery import WorkerSpec


@dataclasses.dataclass
class PDWorker:
    spec: WorkerSpec
    healthy: bool = True
    inflight: int = 0
    consecutive_failures: int = 0

    @property
    def url(self) -> str:
        return self.spec.url


@dataclasses.dataclass
class PDPair:
    prefill: PDWorker
    decode: PDWorker
    room: str


class PDPool:
    """Holds prefill[] and decode[] pools and picks pairs.

    Policies: round_robin | random | shortest_queue (per pool,
    independently — matching the reference's per-pool policy config).
    """

    def __init__(self, prefill: List[WorkerSpec], decode: List[WorkerSpec],
                 policy: str = "shortest_queue"):
        self.prefill = [PDWorker(s) for s in prefill]
        self.decode = [PDWorker(s) for s in decode]
        self.policy = policy
        self._rr_p = itertools.count()
        self._rr_d = itertools.count()

    def sync(self, prefill: List[WorkerSpec], decode: List[WorkerSpec]) -> None:
        """Reconcile pools against a discovery snapshot (keep state for
        workers that survive; add/remove the rest)."""
        for pool, specs in ((self.prefill, prefill), (self.decode, decode)):
            by_url = {w.spec.url: w for w in pool}
            pool[:] = [by_url.get(s.url) or PDWorker(s) for s in specs]

    def _alive(self, pool: List[PDWorker]) -> List[PDWorker]:
        return [w for w in pool if w.healthy]

    def _pick(self, pool: List[PDWorker], rr) -> Optional[PDWorker]:
        alive = self._alive(pool)
        if not alive:
            return None
        if self.policy == "round_robin":
            return alive[next(rr) % len(alive)]
        if self.policy == "random":
            return random.choice(alive)
        return min(alive, key=lambda w: w.inflight)  # shortest_queue

    def pick_pair(self) -> Optional[PDPair]:
        p = self._pick(self.prefill, self._rr_p)
        d = self._pick(self.decode, self._rr_d)
        if p is None or d is None:
            return None
        return PDPair(p, d, room="gw-" + uuid.uuid4().hex)

    @staticmethod
    def mutate_bodies(body: Dict, pair: PDPair) -> Tuple[Dict, Dict]:
        """(prefill_body, decode_body): both carry the bootstrap room; the
        prefill side must not stream (it returns after the KV handoff) and
        the decode side keeps the client's stream setting."""
        pbody = dict(body)
        dbody = dict(body)
        pbody["bootstrap_room"] = pair.room
        pbody["stream"] = False
        dbody["bootstrap_room"] = pair.room
        return pbody, dbody

    def stats(self) -> Dict:
        return {
            "prefill": [
                {"url": w.url, "healthy": w.healthy, "inflight": w.inflight}
                for w in self.prefill
            ],
            "decode": [
                {"url": w.url, "healthy": w.healthy, "inflight": w.inflight,
                 "bootstrap_url": w.spec.bootstrap_url}
                for w in self.decode
            ],
            "policy": self.policy,
        }
