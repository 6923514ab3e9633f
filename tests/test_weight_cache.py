"""Weight-cache daemon: preprocess once in shm, load many engines.

Ref: srt/weight_cache/ + test/registered/model_loading/
test_weight_cache_daemon.py. The daemon runs host preprocessing (parse/
assemble/quantize) and pins final storage arrays in POSIX shm; engines
map the manifest and device_put with their own shardings
(weight_cache/__init__.py design note).
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from sglang_tpu.weight_cache.protocol import (
    get_ready_path,
    get_socket_path,
    recv_msg,
    send_msg,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def daemon(tiny_llama_dir):
    """int8-quantizing daemon subprocess serving the tiny checkpoint."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "sglang_tpu.weight_cache.daemon",
         "--model-path", tiny_llama_dir, "--quantization", "int8",
         "--dtype", "float32"],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    ready = get_ready_path(tiny_llama_dir)
    deadline = time.time() + 120
    while not os.path.exists(ready):
        if proc.poll() is not None:
            raise RuntimeError(f"daemon died:\n{proc.stdout.read()}")
        if time.time() > deadline:
            proc.kill()
            raise TimeoutError("daemon never became ready")
        time.sleep(0.2)
    yield tiny_llama_dir
    # Graceful shutdown over the socket (covers the shutdown rpc).
    try:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.connect(get_socket_path(tiny_llama_dir))
        send_msg(s, {"type": "shutdown"})
        recv_msg(s)
        s.close()
    except OSError:
        proc.terminate()
    proc.wait(timeout=30)
    assert not os.path.exists(get_socket_path(tiny_llama_dir))
    assert not os.path.exists(ready)


def _build(model_path, quantization, mode):
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_path, dtype="float32", quantization=quantization,
        attention_backend="xla_native", page_size=4, max_total_tokens=1024,
        weight_cache_mode=mode,
    )
    return ModelRunner(args)


def test_cache_load_matches_disk_load(daemon):
    """Every param entry loaded via shm equals the disk-loaded one, and
    generation through the scheduler is identical."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.sampling.sampling_params import SamplingParams

    disk = _build(daemon, "int8", None)
    cached = _build(daemon, "int8", "client")
    assert disk.params.keys() == cached.params.keys()
    for k in disk.params:
        np.testing.assert_array_equal(
            np.asarray(disk.params[k]), np.asarray(cached.params[k]), err_msg=k
        )

    def gen(runner):
        from sglang_tpu.server_args import ServerArgs  # noqa: F401

        core = ScheduleCore(runner.server_args, runner)
        sp = SamplingParams(temperature=0.0, max_new_tokens=8,
                            ignore_eos=True)
        sp.normalize()
        req = Req("r", [5, 9, 3, 7, 2, 8], sp)
        core.add_request(req)
        while core.has_work():
            core.step()
        return req.output_ids

    assert gen(cached) == gen(disk)


def test_config_mismatch_raises(daemon):
    """An engine whose flags change the materialized layout (here: no
    quantization vs the daemon's int8) must get a hard error, not a
    silent disk fallback (ref ipc_loader.py client-mode semantics)."""
    with pytest.raises(RuntimeError, match="mismatch"):
        _build(daemon, None, "client")


def test_absent_daemon_semantics(tmp_path, tiny_llama_dir):
    """No socket: client mode disk-loads; daemon mode raises."""
    import shutil

    # A copy of the checkpoint => different realpath => different socket.
    alone = str(tmp_path / "alone")
    shutil.copytree(tiny_llama_dir, alone)
    runner = _build(alone, None, "client")
    assert runner.params  # disk fallback worked
    with pytest.raises(RuntimeError, match="daemon"):
        _build(alone, None, "daemon")
