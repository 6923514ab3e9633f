"""Multi-worker router: cache-aware load balancing over server replicas.

Ref: sgl-model-gateway (Rust, 114.5k LoC) — worker registry, health checks,
and routing policies including `cache_aware` (a per-worker radix tree over
recent request prefixes, policies/cache_aware.rs:112 + policies/tree.rs).
The per-request CPU-hot core (path-compressed radix tree with worker
tenancy bitsets + LRU eviction, registry, circuit breaker, selection) is
NATIVE C++ (csrc/gateway_core.cpp via ctypes, the SURVEY §2.10.5
obligation); this module is the async HTTP shell. A pure-Python CharTree
fallback keeps the router available if the toolchain is absent.

    python -m sglang_tpu.router --port 8000 \
        --workers http://h1:30000 http://h2:30000 --policy cache_aware
"""

from __future__ import annotations

import argparse
import asyncio
import itertools
import json
import logging
import random
import time
from typing import Dict, List, Optional, Tuple

import aiohttp
from aiohttp import web

logger = logging.getLogger(__name__)


class CharTree:
    """Approximate radix tree over request-text prefixes per worker
    (character granularity, like the reference's gateway tree)."""

    def __init__(self, max_nodes: int = 1 << 16):
        self.root: Dict = {}
        self.count = 0
        self.max_nodes = max_nodes

    def insert(self, text: str, worker: int, chunk: int = 16) -> None:
        node = self.root
        for i in range(0, min(len(text), 512), chunk):
            key = text[i : i + chunk]
            nxt = node.get(key)
            if nxt is None:
                if self.count >= self.max_nodes:
                    return
                nxt = {"_w": set()}
                node[key] = nxt
                self.count += 1
            nxt["_w"].add(worker)
            node = nxt

    def match(self, text: str, chunk: int = 16) -> Dict[int, int]:
        """worker -> matched chars."""
        scores: Dict[int, int] = {}
        node = self.root
        depth = 0
        for i in range(0, min(len(text), 512), chunk):
            nxt = node.get(text[i : i + chunk])
            if nxt is None:
                break
            depth += chunk
            for w in nxt["_w"]:
                scores[w] = depth
            node = nxt
        return scores


class Worker:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.healthy = True
        self.inflight = 0
        self.consecutive_failures = 0


class Router:
    def __init__(self, workers: List[str], policy: str = "cache_aware",
                 use_native: bool = True):
        self.workers = [Worker(u) for u in workers]
        self.policy = policy
        self.core = None
        if use_native:
            try:
                from sglang_tpu.gateway_core import GatewayCore

                self.core = GatewayCore()
                for _ in self.workers:
                    self.core.add_worker()
            except Exception as e:  # noqa: BLE001
                logger.warning(
                    "native gateway core unavailable (%s); "
                    "falling back to the Python tree", e,
                )
        self.tree = CharTree()
        self._rr = itertools.count()
        self.session: Optional[aiohttp.ClientSession] = None

    def _alive(self) -> List[Tuple[int, Worker]]:
        return [(i, w) for i, w in enumerate(self.workers) if w.healthy]

    def record_insert(self, text: str, idx: int) -> None:
        if self.core is not None:
            self.core.insert(text, idx)
        else:
            self.tree.insert(text, idx)

    def pick(self, text: str) -> Tuple[int, Worker]:
        if self.core is not None:
            i = self.core.pick(text or "", self.policy)
            if i < 0:
                raise web.HTTPServiceUnavailable(text="no healthy workers")
            return i, self.workers[i]
        alive = self._alive()
        if not alive:
            raise web.HTTPServiceUnavailable(text="no healthy workers")
        if self.policy == "round_robin":
            i = next(self._rr) % len(alive)
            return alive[i]
        if self.policy == "random":
            return random.choice(alive)
        if self.policy == "shortest_queue":
            return min(alive, key=lambda x: x[1].inflight)
        # cache_aware: best prefix match unless its queue is much longer
        scores = self.tree.match(text or "")
        best = None
        for i, w in alive:
            s = scores.get(i, 0)
            if best is None or s > best[2]:
                best = (i, w, s)
        i, w, s = best
        least_i, least_w = min(alive, key=lambda x: x[1].inflight)
        if s == 0 or w.inflight > least_w.inflight + 8:
            return least_i, least_w
        return i, w

    async def health_loop(self) -> None:
        while True:
            for w in self.workers:
                try:
                    async with self.session.get(
                        w.url + "/health",
                        timeout=aiohttp.ClientTimeout(total=5),
                    ) as r:
                        ok = r.status == 200
                except Exception:  # noqa: BLE001
                    ok = False
                if ok:
                    w.healthy = True
                    w.consecutive_failures = 0
                    if self.core is not None:
                        self.core.set_health(self.workers.index(w), True)
                else:
                    w.consecutive_failures += 1
                    if self.core is not None:
                        # native circuit breaker mirrors the state
                        w.healthy = self.core.record_failure(
                            self.workers.index(w), threshold=3
                        )
                    elif w.consecutive_failures >= 3:  # circuit breaker
                        w.healthy = False
            await asyncio.sleep(5)

    # ------------------------------------------------------------- handlers
    async def proxy(self, request: web.Request) -> web.StreamResponse:
        body_bytes = await request.read()
        text = ""
        try:
            body = json.loads(body_bytes) if body_bytes else {}
            text = body.get("text") or ""
            if not text and body.get("messages"):
                text = json.dumps(body["messages"])[:512]
            if not text and body.get("prompt"):
                p = body["prompt"]
                text = p if isinstance(p, str) else json.dumps(p)[:512]
        except Exception:  # noqa: BLE001
            pass
        idx, worker = self.pick(text)
        worker.inflight += 1
        if self.core is not None:
            self.core.inc_inflight(idx)
        try:
            async with self.session.request(
                request.method,
                worker.url + request.path,
                data=body_bytes,
                headers={"Content-Type": "application/json"},
                timeout=aiohttp.ClientTimeout(total=3600),
            ) as upstream:
                if text:
                    self.record_insert(text, idx)
                resp = web.StreamResponse(
                    status=upstream.status, headers=upstream.headers.copy()
                )
                await resp.prepare(request)
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
                return resp
        finally:
            worker.inflight -= 1
            if self.core is not None:
                self.core.dec_inflight(idx)

    async def list_workers(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "workers": [
                    {"url": w.url, "healthy": w.healthy,
                     "inflight": w.inflight}
                    for w in self.workers
                ],
                "policy": self.policy,
            }
        )

    async def add_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.workers.append(Worker(body["url"]))
        if self.core is not None:
            self.core.add_worker()
        return web.json_response({"success": True})

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=64 * 1024 * 1024)

        async def on_start(app_):
            self.session = aiohttp.ClientSession()
            asyncio.get_event_loop().create_task(self.health_loop())

        app.on_startup.append(on_start)
        app.router.add_get("/router/workers", self.list_workers)
        app.router.add_post("/router/add_worker", self.add_worker)
        app.router.add_route("*", "/{path:.*}", self.proxy)
        return app


def main(argv=None):
    parser = argparse.ArgumentParser("sglang-tpu router")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--workers", nargs="+", required=True)
    parser.add_argument(
        "--policy",
        default="cache_aware",
        choices=["cache_aware", "round_robin", "random", "shortest_queue"],
    )
    args = parser.parse_args(argv)
    router = Router(args.workers, args.policy)
    web.run_app(router.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
