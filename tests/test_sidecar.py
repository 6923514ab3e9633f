"""Sidecar lifecycle (ref srt/entrypoints/sidecar.py:78)."""

import os
import sys
import time
import types

import pytest

from sglang_tpu.entrypoints.sidecar import (
    GRPC_ENDPOINT_ENV,
    _parse_sidecar_args,
    build_sidecar_endpoint,
    start_sidecar,
)

SIDECAR_SRC = """
import json, os, sys, time

def main(argv):
    with open(os.environ["SIDECAR_OUT"], "w") as f:
        json.dump({"endpoint": os.environ["%s"], "argv": list(argv)}, f)
    time.sleep(300)
""" % GRPC_ENDPOINT_ENV


@pytest.fixture
def sidecar_module(tmp_path, monkeypatch):
    (tmp_path / "fake_sidecar.py").write_text(SIDECAR_SRC)
    # mp spawn children copy the PARENT's sys.path (spawn.prepare), not
    # PYTHONPATH — prepend to the live path.
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv("SIDECAR_OUT", str(tmp_path / "out.json"))
    return tmp_path


def _args(**kw):
    d = dict(host="0.0.0.0", port=31234, grpc_port=None, sidecar=None,
             sidecar_args=None)
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_endpoint_and_arg_parsing():
    assert build_sidecar_endpoint(_args()) == "127.0.0.1:31234"
    assert build_sidecar_endpoint(
        _args(host="10.0.0.5", grpc_port=9000)) == "10.0.0.5:9000"
    rest, timeout = _parse_sidecar_args(
        ["--foo", "1", "--sidecar-shutdown-timeout", "5"])
    assert rest == ["--foo", "1"] and timeout == 5.0
    with pytest.raises(ValueError):
        _parse_sidecar_args(["--sidecar-shutdown-timeout", "0"])


def test_sidecar_spawn_and_stop(sidecar_module):
    import json

    sc = start_sidecar(
        _args(sidecar="fake_sidecar", sidecar_args=["--x", "y"]),
        watch=False,  # the real watchdog SIGTERMs the server (and pytest)
    )
    out = os.environ["SIDECAR_OUT"]
    deadline = time.time() + 240  # xdist load starves boots
    while not os.path.exists(out):
        assert time.time() < deadline, "sidecar never wrote output"
        assert sc.proc.is_alive() or sc.proc.exitcode is None or \
            os.path.exists(out), f"sidecar died: {sc.proc.exitcode}"
        time.sleep(0.1)
    time.sleep(0.1)
    with open(out) as f:
        got = json.load(f)
    assert got == {"endpoint": "127.0.0.1:31234", "argv": ["--x", "y"]}
    sc.stop()
    assert not sc.proc.is_alive()


def test_bad_module_exits_nonzero(sidecar_module):
    sc = start_sidecar(_args(sidecar="no_such_module_xyz"), watch=False)
    sc.proc.join(timeout=60)
    assert sc.proc.exitcode not in (0, None)
    sc.stop()
