"""Router e2e: two server replicas behind the cache-aware router."""

import json
import os
import subprocess
import sys
import threading
import time

import pytest
import requests

from sglang_tpu.utils import find_free_port


def _launch_server(tiny_llama_dir, port):
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", TOKENIZERS_PARALLELISM="false")
    return subprocess.Popen(
        [
            sys.executable, "-m", "sglang_tpu.launch_server",
            "--model-path", tiny_llama_dir,
            "--dtype", "float32",
            "--attention-backend", "xla_native",
            "--page-size", "4",
            "--max-total-tokens", "2048",
            "--port", str(port),
            "--enable-single-process",
            "--log-level", "warning",
        ],
        # DEVNULL, not PIPE: an undrained pipe blocks the server once the
        # 64KB buffer fills (see tests/test_http_server.py).
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
    )


@pytest.fixture(scope="module")
def router(tiny_llama_dir):
    p1, p2 = find_free_port(), find_free_port()
    w1, w2 = _launch_server(tiny_llama_dir, p1), _launch_server(tiny_llama_dir, p2)
    for port, proc in ((p1, w1), (p2, w2)):
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                if requests.get(f"http://127.0.0.1:{port}/health",
                                timeout=2).status_code == 200:
                    break
            except Exception:
                pass
            if proc.poll() is not None:
                raise RuntimeError(proc.stdout.read().decode()[-2000:])
            time.sleep(1)
    rport = find_free_port()
    from sglang_tpu.router import Router
    from aiohttp import web
    import asyncio

    router_obj = Router(
        [f"http://127.0.0.1:{p1}", f"http://127.0.0.1:{p2}"], "cache_aware"
    )

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        runner = web.AppRunner(router_obj.build_app())
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", rport)
        loop.run_until_complete(site.start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{rport}"
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            if requests.get(base + "/router/workers", timeout=2).ok:
                break
        except Exception:
            time.sleep(0.5)
    yield base
    w1.terminate()
    w2.terminate()


def test_router_proxies_and_balances(router):
    info = requests.get(router + "/router/workers").json()
    assert len(info["workers"]) == 2
    outs = []
    for i in range(4):
        r = requests.post(
            router + "/generate",
            json={
                "text": f"w{10 + i} w{20 + i}",
                "sampling_params": {"temperature": 0, "max_new_tokens": 3,
                                    "ignore_eos": True},
            },
            timeout=120,
        )
        assert r.status_code == 200, r.text
        outs.append(r.json())
    assert all(len(o["output_ids"]) == 3 for o in outs)


def test_router_cache_affinity(router):
    # same prefix repeatedly -> same worker -> radix hits upstream
    prompt = "w30 w31 w32 w33 w34 w35 w36 w37"
    last = None
    for _ in range(3):
        r = requests.post(
            router + "/generate",
            json={"text": prompt,
                  "sampling_params": {"temperature": 0, "max_new_tokens": 2,
                                      "ignore_eos": True}},
            timeout=120,
        )
        last = r.json()
    assert last["meta_info"]["cached_tokens"] > 0
