"""Gateway unit tests: rate limits, retries, discovery, conversations,
PD-pair routing (with fake upstreams — no engine processes)."""

import asyncio
import json
import time

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from sglang_tpu.gateway import (
    ConcurrencyGate,
    FileDiscovery,
    KeyedRateLimiter,
    MemoryConversationStore,
    PDPool,
    SqliteConversationStore,
    TokenBucket,
    WorkerSpec,
)
from sglang_tpu.gateway.app import Router
from sglang_tpu.gateway.rate_limit import RateLimitExceeded, RetryConfig


# ------------------------------------------------------------- rate limit
def test_token_bucket_refill():
    b = TokenBucket(rate=100.0, burst=2.0)
    assert b.try_acquire() and b.try_acquire()
    assert not b.try_acquire()
    time.sleep(0.05)  # 100/s -> ~5 tokens, capped at burst 2
    assert b.try_acquire() and b.try_acquire()
    assert not b.try_acquire()


def test_keyed_limiter_isolated_keys():
    rl = KeyedRateLimiter(rate=0.0001, burst=1.0)
    assert rl.try_acquire("a")
    assert not rl.try_acquire("a")
    assert rl.try_acquire("b")  # independent bucket


def test_keyed_limiter_eviction():
    rl = KeyedRateLimiter(rate=1.0, burst=1.0, max_keys=4)
    for i in range(10):
        rl.try_acquire(f"k{i}")
    assert len(rl.buckets) <= 4


def test_concurrency_gate_queue_and_reject():
    async def run():
        gate = ConcurrencyGate(max_concurrent=1, max_queue=1, timeout=5.0)
        release = asyncio.Event()

        async def hold():
            async with gate:
                await release.wait()

        async def queued():
            async with gate:
                return "ran"

        h = asyncio.ensure_future(hold())
        await asyncio.sleep(0.01)
        q = asyncio.ensure_future(queued())
        await asyncio.sleep(0.01)
        assert gate.waiting == 1
        # third request: queue is full -> immediate 429
        with pytest.raises(RateLimitExceeded):
            async with gate:
                pass
        release.set()
        assert await q == "ran"
        await h

    asyncio.run(run())


def test_concurrency_gate_timeout():
    async def run():
        gate = ConcurrencyGate(max_concurrent=1, max_queue=4, timeout=0.05)
        async with gate:
            with pytest.raises(RateLimitExceeded):
                async with gate:
                    pass

    asyncio.run(run())


def test_retry_backoff_growth():
    r = RetryConfig(max_retries=3, base_backoff=0.1, max_backoff=1.0)
    assert r.backoff(0) == pytest.approx(0.1)
    assert r.backoff(1) == pytest.approx(0.2)
    assert r.backoff(10) == 1.0  # capped


# -------------------------------------------------------------- discovery
def test_file_discovery_and_sync(tmp_path):
    path = tmp_path / "workers.json"
    path.write_text(json.dumps({"workers": [
        {"url": "http://a:1"},
        {"url": "http://p:1", "role": "prefill"},
        {"url": "http://d:1", "role": "decode",
         "bootstrap_url": "http://d:2"},
    ]}))
    disco = FileDiscovery(str(path))
    specs = disco.load()
    assert [s.role for s in specs] == ["regular", "prefill", "decode"]
    assert specs[2].bootstrap_url == "http://d:2"
    assert disco.load() is None  # unchanged mtime -> no resync

    router = Router(["http://old:1"], "round_robin", use_native=False,
                    pd_prefill=[], pd_decode=[])
    router.sync_workers(specs)
    assert [w.url for w in router.workers] == ["http://a:1"]
    assert [w.url for w in router.pd_pool.prefill] == ["http://p:1"]
    assert [w.url for w in router.pd_pool.decode] == ["http://d:1"]
    # reconcile keeps live worker state for survivors
    router.workers[0].inflight = 7
    router.sync_workers(specs)
    assert router.workers[0].inflight == 7


# ---------------------------------------------------------- conversations
@pytest.mark.parametrize("kind", ["memory", "sqlite"])
def test_conversation_store_crud(kind, tmp_path):
    store = (MemoryConversationStore() if kind == "memory"
             else SqliteConversationStore(str(tmp_path / "c.db")))
    conv = store.create({"topic": "t"}, [{"role": "user", "content": "hi"}])
    cid = conv["id"]
    assert conv["object"] == "conversation"
    assert store.get(cid)["metadata"] == {"topic": "t"}
    assert store.update(cid, {"topic": "u"})["metadata"] == {"topic": "u"}

    new = store.add_items(cid, [{"role": "assistant", "content": "yo"},
                                {"role": "user", "content": "2"}])
    assert len(new) == 2
    items = store.list_items(cid)
    assert [i["content"] for i in items] == ["hi", "yo", "2"]
    assert store.list_items(cid, order="desc")[0]["content"] == "2"
    assert store.list_items(cid, after=items[0]["id"])[0]["content"] == "yo"
    assert store.get_item(cid, items[1]["id"])["content"] == "yo"
    assert store.delete_item(cid, items[1]["id"])
    assert [i["content"] for i in store.list_items(cid)] == ["hi", "2"]
    assert store.delete(cid)
    assert store.get(cid) is None
    assert store.add_items(cid, [{"x": 1}]) is None


def test_conversation_http_routes():
    async def run():
        router = Router([], "round_robin", use_native=False,
                        conversation_store="memory")
        app = router.build_app()
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/v1/conversations",
                                  json={"metadata": {"k": "v"}})
            conv = await r.json()
            assert r.status == 200 and conv["metadata"] == {"k": "v"}
            cid = conv["id"]
            r = await client.post(f"/v1/conversations/{cid}/items",
                                  json={"items": [{"role": "user",
                                                   "content": "hello"}]})
            lst = await r.json()
            assert lst["data"][0]["content"] == "hello"
            r = await client.get(f"/v1/conversations/{cid}/items")
            assert (await r.json())["data"][0]["content"] == "hello"
            r = await client.delete(f"/v1/conversations/{cid}")
            assert (await r.json())["deleted"] is True
            r = await client.get(f"/v1/conversations/{cid}")
            assert r.status == 404
        finally:
            await client.close()

    asyncio.run(run())


# ------------------------------------------------------------ pd routing
def test_pd_pool_pick_and_mutate():
    pool = PDPool(
        [WorkerSpec("http://p1"), WorkerSpec("http://p2")],
        [WorkerSpec("http://d1")],
        policy="shortest_queue",
    )
    pool.prefill[0].inflight = 5
    pair = pool.pick_pair()
    assert pair.prefill.url == "http://p2"
    assert pair.decode.url == "http://d1"
    assert pair.room.startswith("gw-")
    pbody, dbody = PDPool.mutate_bodies(
        {"text": "hi", "stream": True, "sampling_params": {}}, pair
    )
    assert pbody["bootstrap_room"] == dbody["bootstrap_room"] == pair.room
    assert pbody["stream"] is False and dbody["stream"] is True


def test_pd_pool_unhealthy_pair():
    pool = PDPool([WorkerSpec("http://p1")], [WorkerSpec("http://d1")])
    pool.decode[0].healthy = False
    assert pool.pick_pair() is None


# ----------------------------------------------------- proxy integration
def _fake_worker_app(state):
    """Tiny upstream that records requests and can fail on demand."""
    async def generate(request):
        body = await request.json()
        state.setdefault("requests", []).append(
            (request.path, body)
        )
        fails = state.get("fail_next", 0)
        if fails > 0:
            state["fail_next"] = fails - 1
            return web.json_response({"error": "boom"}, status=503)
        return web.json_response({"text": "ok", "rid": body.get("rid")})

    async def health(request):
        return web.Response(text="ok")

    async def abort(request):
        state.setdefault("aborts", []).append(await request.json())
        return web.json_response({"success": True})

    app = web.Application()
    app.router.add_post("/generate", generate)
    app.router.add_get("/health", health)
    app.router.add_post("/abort_request", abort)
    return app


def test_proxy_auth_rate_limit_and_retry():
    async def run():
        state = {}
        upstream = TestServer(_fake_worker_app(state))
        await upstream.start_server()
        url = f"http://127.0.0.1:{upstream.port}"

        router = Router([url], "round_robin", use_native=False,
                        api_key="sk-test", rate_limit_rps=1000.0,
                        rate_limit_burst=1000.0, retries=2)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            # no key -> 401
            r = await client.post("/generate", json={"text": "x"})
            assert r.status == 401
            hdr = {"Authorization": "Bearer sk-test"}
            # retry: upstream 503s once, then succeeds (same worker is
            # excluded per attempt, but it's the only one -> re-picked
            # never happens; use 2 workers semantics via fail_next=1 and
            # retries on the same pool is exhausted -> expect one retry
            # path through the second attempt failing with 503 passthrough)
            r = await client.post("/generate", json={"text": "x"},
                                  headers=hdr)
            assert r.status == 200
            state["fail_next"] = 1
            r = await client.post("/generate", json={"text": "x"},
                                  headers=hdr)
            # single worker: retry re-picks fail -> 503 surfaced or retry
            # succeeded after backoff on a fresh pick
            assert r.status in (200, 503)
        finally:
            await client.close()
            await upstream.close()

    asyncio.run(run())


def test_proxy_rate_limit_429():
    async def run():
        state = {}
        upstream = TestServer(_fake_worker_app(state))
        await upstream.start_server()
        url = f"http://127.0.0.1:{upstream.port}"
        router = Router([url], "round_robin", use_native=False,
                        rate_limit_rps=0.001, rate_limit_burst=1.0)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            r = await client.post("/generate", json={"text": "x"})
            assert r.status == 200
            r = await client.post("/generate", json={"text": "x"})
            assert r.status == 429
            assert "Retry-After" in r.headers
        finally:
            await client.close()
            await upstream.close()

    asyncio.run(run())


def test_pd_dual_dispatch_and_prefill_failure_abort():
    async def run():
        pstate, dstate = {}, {}
        pserver = TestServer(_fake_worker_app(pstate))
        dserver = TestServer(_fake_worker_app(dstate))
        await pserver.start_server()
        await dserver.start_server()
        purl = f"http://127.0.0.1:{pserver.port}"
        durl = f"http://127.0.0.1:{dserver.port}"

        router = Router([], "round_robin", use_native=False,
                        pd_prefill=[WorkerSpec(purl)],
                        pd_decode=[WorkerSpec(durl)])
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            r = await client.post("/generate", json={"text": "hi"})
            assert r.status == 200
            # both sides saw the request with the same room
            proom = pstate["requests"][0][1]["bootstrap_room"]
            droom = dstate["requests"][0][1]["bootstrap_room"]
            assert proom == droom
            assert pstate["requests"][0][1]["stream"] is False

            # prefill failure -> decode-side abort by rid
            pstate["fail_next"] = 10
            r = await client.post("/generate", json={"text": "hi2"})
            await asyncio.sleep(0.3)  # watcher fires the abort
            assert dstate.get("aborts"), "expected an /abort_request"
            aborted_rid = dstate["aborts"][0]["rid"]
            assert aborted_rid == dstate["requests"][1][1]["rid"]
        finally:
            await client.close()
            await pserver.close()
            await dserver.close()

    asyncio.run(run())


def test_router_metrics_endpoint():
    async def run():
        router = Router(["http://a:1"], "round_robin", use_native=False)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            r = await client.get("/router/metrics")
            text = await r.text()
            assert "sglang_gateway_requests_total" in text
            assert 'worker="http://a:1"' in text
        finally:
            await client.close()

    asyncio.run(run())
