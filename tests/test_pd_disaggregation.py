"""PD disaggregation e2e with the fake transfer backend.

Ref: test/registered/mock_model/test_e2e_pd.py + srt/disaggregation/fake.
Prefill engine computes KV + first token; decode engine restores KV and
continues — outputs must equal a single-engine run.
"""

import numpy as np
import pytest

from sglang_tpu.core.req import Req, ReqStatus
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


def test_pd_chunked_inflight_send(tiny_llama_dir):
    """A multi-chunk prefill ships full pages WHILE later chunks still
    compute (ref early-chunk send, scheduler.py:3598-3601); the decode
    engine auto-admits the assembled handoff from its prealloc queue."""
    from sglang_tpu.disaggregation.base import KVChunk
    from sglang_tpu.disaggregation.fake import sent_messages

    reset_store()
    prompt = list(range(3, 3 + 20))  # 3 chunks at chunked_prefill_size=8
    n_new = 6

    single, _ = make_core(tiny_llama_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    base = Req("base", prompt, sp)
    single.add_request(base)
    drive(single)

    prefill, _ = make_core(tiny_llama_dir, "prefill", chunked_prefill_size=8)
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp2.normalize()
    preq = Req("roomC", prompt, sp2)
    preq.bootstrap_room = "roomC"
    prefill.add_request(preq)
    drive(prefill)

    msgs = [m for m in sent_messages() if m.room == "roomC"]
    assert all(isinstance(m, KVChunk) for m in msgs)
    assert len(msgs) >= 2, "expected in-flight chunks before the final send"
    assert not msgs[0].is_last and msgs[0].start_page == 0
    assert msgs[-1].is_last and msgs[-1].token_ids == prompt
    # chunk boundaries tile the request without overlap
    covered = sorted((m.start_page, m.kv_pages.shape[0]) for m in msgs)
    pos = 0
    for start, k in covered:
        assert start == pos
        pos += k
    assert pos == (len(prompt) + 3) // 4  # cdiv(20, page_size=4)

    # decode engine: request parked BEFORE KV (already arrived here, but
    # the admission path is the prealloc poll either way)
    decode, _ = make_core(tiny_llama_dir, "decode")
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp3.normalize()
    dreq = Req("roomC", prompt, sp3)
    dreq.bootstrap_room = "roomC"
    decode.add_request(dreq)
    assert "roomC" in decode.pd_prealloc and not decode.waiting
    drive(decode)
    assert dreq.output_ids == base.output_ids


def test_pd_auto_admission_waits_for_kv(tiny_llama_dir):
    """The decode engine parks a request whose KV has not arrived, does
    not schedule it, then admits and finishes once the transfer lands."""
    reset_store()
    prompt = [11, 12, 13, 14, 15]
    n_new = 5

    single, _ = make_core(tiny_llama_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    base = Req("base", prompt, sp)
    single.add_request(base)
    drive(single)

    decode, _ = make_core(tiny_llama_dir, "decode")
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp3.normalize()
    dreq = Req("roomW", prompt, sp3)
    dreq.bootstrap_room = "roomW"
    decode.add_request(dreq)
    assert decode.has_work()
    for _ in range(3):  # KV not there yet: step must idle, not crash
        decode.step()
    assert dreq.status != ReqStatus.RUNNING and not dreq.output_ids

    prefill, _ = make_core(tiny_llama_dir, "prefill")
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp2.normalize()
    preq = Req("roomW", prompt, sp2)
    preq.bootstrap_room = "roomW"
    prefill.add_request(preq)
    drive(prefill)

    drive(decode)
    assert not decode.pd_prealloc
    assert dreq.output_ids == base.output_ids


def test_pd_tp2_both_sides(tiny_llama_dir):
    """PD with tp=2 GSPMD-sharded engines on both sides: the wire carries
    the gathered (unsharded) page bytes; outputs equal a tp=1 single run."""
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.parallel.mesh import create_mesh

    reset_store()
    prompt = [5, 9, 33, 41, 2, 77, 18, 60, 24]
    n_new = 6

    single, _ = make_core(tiny_llama_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp.normalize()
    base = Req("base", prompt, sp)
    single.add_request(base)
    drive(single)

    def make_tp2(mode):
        args = ServerArgs(
            model_path=tiny_llama_dir, dtype="float32",
            attention_backend="xla_native", page_size=4,
            max_total_tokens=2048, max_running_requests=8,
            tp_size=2, disaggregation_mode=mode,
        )
        mesh_ctx = create_mesh(tp_size=2)
        return ScheduleCore(args, ModelRunner(args, mesh_ctx=mesh_ctx))

    prefill = make_tp2("prefill")
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp2.normalize()
    preq = Req("roomT", prompt, sp2)
    preq.bootstrap_room = "roomT"
    prefill.add_request(preq)
    drive(prefill)

    decode = make_tp2("decode")
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new, ignore_eos=True)
    sp3.normalize()
    dreq = Req("roomT", prompt, sp3)
    dreq.bootstrap_room = "roomT"
    decode.add_request(dreq)
    drive(decode)
    assert dreq.output_ids == base.output_ids


@pytest.fixture(scope="module")
def tiny_dsv2_dir(tmp_path_factory):
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(5)
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=None, kv_lora_rank=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, n_group=2,
        topk_group=1, topk_method="group_limited_greedy",
        routed_scaling_factor=1.0, first_k_dense_replace=1,
        moe_layer_freq=1, max_position_embeddings=256, head_dim=24,
    )
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_dsv2_pd")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def test_pd_mla_latent_pool(tiny_dsv2_dir):
    """PD handoff of an MLA LATENT pool (DeepSeek-class): the byte codec
    ships latent pages; decode output must equal a single engine.
    Removes the r3 NotImplementedError (schedule_core.py PD+MLA guard).
    Ref: srt/disaggregation/mooncake/conn.py ships MLA KV the same way."""
    reset_store()
    prompt = [7, 8, 9, 10, 11, 12, 13, 14, 15]
    n_new = 8

    single, _ = make_core(tiny_dsv2_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    base = Req("base-mla", prompt, sp)
    single.add_request(base)
    drive(single)

    prefill, _ = make_core(tiny_dsv2_dir, "prefill")
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                         ignore_eos=True)
    sp2.normalize()
    preq = Req("room-mla", prompt, sp2)
    preq.bootstrap_room = "room-mla"
    prefill.add_request(preq)
    drive(prefill)
    assert len(preq.output_ids) == 1

    decode, _ = make_core(tiny_dsv2_dir, "decode")
    handoff = FakeKVReceiver().poll("room-mla")
    assert handoff is not None
    assert handoff.kv_pages.dtype == np.uint8  # codec bytes on the wire
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                         ignore_eos=True)
    sp3.normalize()
    dreq = decode.add_prebuilt_request(handoff, sp3)
    drive(decode)
    assert dreq.output_ids == base.output_ids


def test_pd_swa_hybrid_pool():
    """PD handoff for hybrid-SWA models (Gemma-2-class): full layers
    ship with main pages, sliding layers with swa pages; decode output
    must equal a single engine. Removes the r3 NotImplementedError
    (schedule_core.py PD+SWA guard)."""
    from tests.test_gemma2 import _build_tiny_gemma2

    model_dir = _build_tiny_gemma2()
    reset_store()
    prompt = [7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18]
    n_new = 10

    single, _ = make_core(model_dir, "null")
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    base = Req("base-swa", prompt, sp)
    single.add_request(base)
    drive(single)
    assert single.hybrid_swa  # the fixture really exercises hybrid pools

    prefill, _ = make_core(model_dir, "prefill")
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                         ignore_eos=True)
    sp2.normalize()
    preq = Req("room-swa", prompt, sp2)
    preq.bootstrap_room = "room-swa"
    prefill.add_request(preq)
    drive(prefill)

    decode, _ = make_core(model_dir, "decode")
    handoff = FakeKVReceiver().poll("room-swa")
    assert handoff is not None and handoff.swa_pages is not None
    sp3 = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                         ignore_eos=True)
    sp3.normalize()
    dreq = decode.add_prebuilt_request(handoff, sp3)
    drive(decode)
    assert dreq.output_ids == base.output_ids
