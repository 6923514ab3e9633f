"""Embedded native HTTP server (csrc/http_server.cpp): routing,
keep-alive, native /health fast path, concurrent handlers, and the
engine-backed /generate. Ref: rust/sglang-server."""

import json
import threading
import urllib.request

import pytest

from sglang_tpu.entrypoints.native_server import NativeServer


def _post(port, path, payload, timeout=30):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path, timeout=30):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    ) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture
def srv():
    s = NativeServer(port=0, n_workers=4)
    s.route("POST", "/echo", lambda body: {"you_sent": body})
    s.route("GET", "/info", lambda body: {"name": "native"})
    s.route("POST", "/boom", lambda body: 1 / 0)
    s.start()
    yield s
    s.stop()


def test_routing_and_echo(srv):
    status, data = _post(srv.port, "/echo", {"a": [1, 2, 3]})
    assert status == 200
    assert data == {"you_sent": {"a": [1, 2, 3]}}
    status, data = _get(srv.port, "/info")
    assert status == 200 and data["name"] == "native"


def test_health_native_fast_path(srv):
    status, data = _get(srv.port, "/health")
    assert status == 200 and data["status"] == "ok"


def test_404_and_handler_error(srv):
    status, data = _post(srv.port, "/nope", {})
    assert status == 404
    status, data = _post(srv.port, "/boom", {})
    assert status == 500 and "error" in data


def test_keep_alive_many_requests_one_connection(srv):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    try:
        for i in range(5):
            conn.request("POST", "/echo", json.dumps({"i": i}),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            assert json.loads(resp.read())["you_sent"]["i"] == i
    finally:
        conn.close()


def test_concurrent_requests(srv):
    results = []
    lock = threading.Lock()

    def hit(i):
        status, data = _post(srv.port, "/echo", {"i": i})
        with lock:
            results.append((status, data["you_sent"]["i"]))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(r[1] for r in results) == list(range(8))
    assert all(r[0] == 200 for r in results)


def test_engine_generate_roundtrip(tiny_llama_dir):
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.entrypoints.native_server import serve_engine

    eng = Engine(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=512, max_running_requests=2,
        enable_single_process=True,
    )
    srv = None
    try:
        srv = serve_engine(eng, port=0, n_workers=2)
        status, info = _get(srv.port, "/get_model_info")
        assert status == 200 and info["model_path"] == tiny_llama_dir
        status, out = _post(srv.port, "/generate", {
            "input_ids": [5, 6, 7, 8],
            "sampling_params": {"temperature": 0.0, "max_new_tokens": 4,
                                "ignore_eos": True},
        }, timeout=120)
        assert status == 200
        assert len(out["output_ids"]) == 4
    finally:
        if srv is not None:
            srv.stop()
        eng.shutdown()


def test_pipelined_requests_one_write(srv):
    """Two full requests sent in ONE write must both be answered (the
    carry-buffer path: bytes beyond the first Content-Length are the next
    request, not trash)."""
    import socket

    body1 = json.dumps({"i": 1}).encode()
    body2 = json.dumps({"i": 2}).encode()

    def req(path, body):
        return (
            f"POST {path} HTTP/1.1\r\nHost: x\r\nContent-Type: "
            f"application/json\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    with socket.create_connection(("127.0.0.1", srv.port), timeout=30) as sk:
        sk.sendall(req("/echo", body1) + req("/echo", body2))
        sk.settimeout(30)
        data = b""
        while data.count(b"HTTP/1.1 200") < 2 or not data.endswith(b"}}"):
            chunk = sk.recv(65536)
            if not chunk:
                break
            data = data + chunk
    assert data.count(b"HTTP/1.1 200") == 2
    assert b'"i": 1' in data and b'"i": 2' in data


def test_stop_with_idle_keepalive_clients_does_not_hang():
    """N idle keep-alive connections must not block hs_destroy's joins
    (hs_stop shuts down every live socket)."""
    import socket
    import time

    s = NativeServer(port=0, n_workers=2)
    s.route("GET", "/info", lambda body: {"ok": True})
    s.start()
    socks = [
        socket.create_connection(("127.0.0.1", s.port), timeout=10)
        for _ in range(4)
    ]
    # one real request so connections are live in the event loop
    status, _ = _get(s.port, "/health")
    assert status == 200
    t0 = time.monotonic()
    done = []

    def stopper():
        s.stop()
        done.append(time.monotonic() - t0)

    t = threading.Thread(target=stopper)
    t.start()
    t.join(timeout=15)
    assert not t.is_alive(), "stop() hung with idle keep-alive clients"
    assert done and done[0] < 10
    for sk in socks:
        sk.close()
