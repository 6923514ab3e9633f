"""PD disaggregation e2e with the fake transfer backend.

Ref: test/registered/mock_model/test_e2e_pd.py + srt/disaggregation/fake.
Prefill engine computes KV + first token; decode engine restores KV and
continues — outputs must equal a single-engine run.
"""

import numpy as np
import pytest

from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.disaggregation.fake import FakeKVReceiver, reset_store
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs


def make_core(model_dir, mode, **kw):
    args = ServerArgs(
        model_path=model_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        max_running_requests=8,
        disaggregation_mode=mode,
        **kw,
    )
    return ScheduleCore(args, ModelRunner(args)), args


def drive(core, max_steps=500):
    steps = 0
    while core.has_work():
        core.step()
        steps += 1
        assert steps < max_steps


def test_pd_matches_single_engine(tiny_llama_dir):
    reset_store()
    prompt = [7, 8, 9, 10, 11, 12, 13]
    n_new = 10

    # baseline: single engine
    single, _ = make_core(tiny_llama_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    base = Req("base", prompt, sp)
    single.add_request(base)
    drive(single)

    # prefill engine
    prefill, _ = make_core(tiny_llama_dir, "prefill")
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp2.normalize()
    preq = Req("room1", prompt, sp2)
    preq.bootstrap_room = "room1"
    prefill.add_request(preq)
    drive(prefill)
    assert len(preq.output_ids) == 1  # first token only

    # decode engine picks up the handoff
    decode, _ = make_core(tiny_llama_dir, "decode")
    handoff = FakeKVReceiver().poll("room1")
    assert handoff is not None
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp3.normalize()
    dreq = decode.add_prebuilt_request(handoff, sp3)
    drive(decode)

    assert dreq.output_ids == base.output_ids


def test_pd_zmq_transport_with_bootstrap(tiny_llama_dir, tmp_path):
    """Real-socket PD: KV rides a ZMQ PUSH/PULL pair, the prefill engine
    resolves the decode engine's address via its HTTP bootstrap server,
    and outputs equal a single-engine run."""
    import urllib.request

    prompt = [3, 14, 15, 9, 26, 5, 35]
    n_new = 8

    single, _ = make_core(tiny_llama_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    base = Req("base", prompt, sp)
    single.add_request(base)
    drive(single)

    kv_addr = f"ipc://{tmp_path}/pd_kv"
    decode_args = dict(
        disaggregation_transport="zmq",
        disaggregation_kv_addr=kv_addr,
        disaggregation_bootstrap_port=0,  # ephemeral
    )
    decode, _ = make_core(tiny_llama_dir, "decode", **decode_args)
    assert decode.pd_bootstrap is not None
    burl = f"http://127.0.0.1:{decode.pd_bootstrap.port}"
    # bootstrap resolves to the receiver's address
    from sglang_tpu.disaggregation.zmq_transport import resolve_bootstrap

    assert resolve_bootstrap(burl) == kv_addr

    prefill, _ = make_core(
        tiny_llama_dir, "prefill",
        disaggregation_transport="zmq",
        disaggregation_bootstrap_url=burl,
    )
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                         ignore_eos=True)
    sp2.normalize()
    preq = Req("roomZ", prompt, sp2)
    preq.bootstrap_room = "roomZ"
    prefill.add_request(preq)
    drive(prefill)
    assert len(preq.output_ids) == 1

    # the handoff crossed real sockets into the decode engine's receiver
    import time as _t

    handoff = None
    for _ in range(100):
        handoff = decode.kv_receiver.poll("roomZ")
        if handoff is not None:
            break
        _t.sleep(0.05)
    assert handoff is not None
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                         ignore_eos=True)
    sp3.normalize()
    dreq = decode.add_prebuilt_request(handoff, sp3)
    drive(decode)
    assert dreq.output_ids == base.output_ids
    decode.pd_bootstrap.shutdown()
