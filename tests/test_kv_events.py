"""KV cache event publishing (--kv-events-config): BlockStored /
BlockRemoved / AllBlocksCleared over ZMQ PUB, rolling page-chunk hashes."""

import json
import time

import numpy as np
import pytest
import zmq

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.observability.kv_events import block_hashes
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import find_free_port


def test_block_hashes_rolling():
    a = block_hashes([1, 2, 3, 4, 5, 6, 7, 8], 4)
    b = block_hashes([1, 2, 3, 4, 9, 9, 9, 9], 4)
    assert len(a) == 2 and a[0] == b[0] and a[1] != b[1]
    assert block_hashes([1, 2, 3], 4) == []


def test_kv_events_end_to_end(tiny_llama_dir):
    port = find_free_port()
    args = ServerArgs(
        model_path=tiny_llama_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=4096, max_running_requests=16,
        kv_events_config=json.dumps(
            {"endpoint": f"tcp://127.0.0.1:{port}", "topic": "kv"}
        ),
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sub = zmq.Context.instance().socket(zmq.SUB)
    sub.connect(f"tcp://127.0.0.1:{port}")
    sub.setsockopt(zmq.SUBSCRIBE, b"kv")
    time.sleep(0.3)  # PUB/SUB join

    rng = np.random.default_rng(4)
    for i in range(2):
        sp = SamplingParams(temperature=0.0, max_new_tokens=4,
                            ignore_eos=True)
        sp.normalize()
        core.add_request(
            Req(f"k{i}", [int(t) for t in rng.integers(3, 200, size=9)], sp)
        )
    n = 0
    while core.has_work():
        core.step()
        n += 1
        assert n < 300
    core.flush_cache()

    events = []
    deadline = time.time() + 5
    while time.time() < deadline:
        try:
            topic, data = sub.recv_multipart(flags=zmq.NOBLOCK)
            events.append(json.loads(data))
        except zmq.Again:
            if any(e["type"] == "AllBlocksCleared" for e in events):
                break
            time.sleep(0.05)
    kinds = {e["type"] for e in events}
    assert "BlockStored" in kinds
    assert "AllBlocksCleared" in kinds
    stored = [e for e in events if e["type"] == "BlockStored"]
    assert all(e["block_hashes"] for e in stored)
    # monotone sequence numbers
    seqs = [e["seq"] for e in events]
    assert seqs == sorted(seqs)
