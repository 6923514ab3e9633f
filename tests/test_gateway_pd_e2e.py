"""Gateway PD e2e: prefill server + decode server + gateway dual dispatch.

The client talks ONLY to the gateway; the gateway injects a bootstrap
room, POSTs to both engines, and streams the decode engine's output.
Outputs must equal a single-engine run (ref: sgl-model-gateway PD router
+ srt/disaggregation)."""

import json
import os
import subprocess
import sys
import time

import pytest
import requests

from sglang_tpu.utils import find_free_port


def _launch(tiny_llama_dir, port, extra):
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
        ] + extra,
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
    )


def _wait(port, proc, deadline=300):
    end = time.time() + deadline
    while time.time() < end:
        try:
            if requests.get(f"http://127.0.0.1:{port}/health",
                            timeout=2).status_code == 200:
                return
        except Exception:
            pass
        if proc.poll() is not None:
            raise RuntimeError(f"server on {port} died")
        time.sleep(1)
    raise TimeoutError(f"server on {port} not healthy")


@pytest.fixture(scope="module")
def pd_gateway(tiny_llama_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pdgw")
    kv_addr = f"ipc://{tmp}/pd_kv"
    dport, pport, bport = find_free_port(), find_free_port(), find_free_port()
    # Boot SEQUENTIALLY: under a parallel full-suite run three cold
    # engine boots at once can exceed the health deadline.
    procs = []
    try:
        decode = _launch(tiny_llama_dir, dport, [
            "--disaggregation-mode", "decode",
            "--disaggregation-transport", "zmq",
            "--disaggregation-kv-addr", kv_addr,
            "--disaggregation-bootstrap-port", str(bport),
        ])
        procs.append(decode)
        _wait(dport, decode, deadline=600)
        prefill = _launch(tiny_llama_dir, pport, [
            "--disaggregation-mode", "prefill",
            "--disaggregation-transport", "zmq",
            "--disaggregation-bootstrap-url", f"http://127.0.0.1:{bport}",
        ])
        procs.append(prefill)
        _wait(pport, prefill, deadline=600)
        # single-engine baseline
        sport = find_free_port()
        single = _launch(tiny_llama_dir, sport, [])
        procs.append(single)
        _wait(sport, single, deadline=600)

        import asyncio
        import threading

        from aiohttp import web

        from sglang_tpu.gateway.app import Router
        from sglang_tpu.gateway.discovery import WorkerSpec

        router = Router(
            [], "round_robin",
            pd_prefill=[WorkerSpec(f"http://127.0.0.1:{pport}")],
            pd_decode=[WorkerSpec(f"http://127.0.0.1:{dport}")],
        )
        gport = find_free_port()
        loop = asyncio.new_event_loop()
        runner_box = {}

        def serve():
            asyncio.set_event_loop(loop)

            async def start():
                runner = web.AppRunner(router.build_app())
                await runner.setup()
                site = web.TCPSite(runner, "127.0.0.1", gport)
                await site.start()
                runner_box["runner"] = runner

            loop.run_until_complete(start())
            loop.run_forever()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        end = time.time() + 30
        while time.time() < end:
            try:
                requests.get(f"http://127.0.0.1:{gport}/router/workers",
                             timeout=2)
                break
            except Exception:
                time.sleep(0.3)
        yield gport, sport
        loop.call_soon_threadsafe(loop.stop)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=20)
            except subprocess.TimeoutExpired:
                p.kill()


def test_pd_gateway_matches_single_engine(pd_gateway):
    gport, sport = pd_gateway
    payload = {
        "text": "The capital of France is",
        "sampling_params": {"temperature": 0.0, "max_new_tokens": 8,
                            "ignore_eos": True},
    }
    single = requests.post(f"http://127.0.0.1:{sport}/generate",
                           json=payload, timeout=120).json()
    via_gw = requests.post(f"http://127.0.0.1:{gport}/generate",
                           json=payload, timeout=120).json()
    assert via_gw["text"] == single["text"]
    meta = via_gw.get("meta_info", {})
    assert meta.get("finish_reason", {}).get("type") in ("length", "stop")


def test_pd_gateway_streaming(pd_gateway):
    gport, _ = pd_gateway
    payload = {
        "text": "Hello",
        "stream": True,
        "sampling_params": {"temperature": 0.0, "max_new_tokens": 6,
                            "ignore_eos": True},
    }
    with requests.post(f"http://127.0.0.1:{gport}/generate", json=payload,
                       stream=True, timeout=120) as r:
        chunks = []
        for line in r.iter_lines():
            if line.startswith(b"data:"):
                body = line[5:].strip()
                if body == b"[DONE]":
                    break
                chunks.append(json.loads(body))
    assert chunks and chunks[-1]["meta_info"]["finish_reason"] is not None
