"""DSA (DeepSeek Sparse Attention, V3.2) — lightning indexer + top-k
sparse MLA attention.

Ref: srt/layers/attention/dsa/{dsa_indexer.py,dsa_topk_backend.py},
kernels/ops/attention/dsa fp8_index (score = sum_h gate_h * relu(q_h.k)),
srt/configs/model_config.py:106 is_deepseek_dsa (index_topk attr enables).

No HF modeling class exists for V3.2 in-image, so parity is established
structurally: (a) with index_topk >= padded context the dense short-
circuit must match plain V2 token-for-token; (b) with padded context >
index_topk >= true sequence length the SPARSE path runs, selects every
valid position, and must still match; (c) the decode scoring/top-k/
gather pipeline matches a numpy oracle on random inputs.
"""

import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_dsa_dirs(tmp_path_factory):
    """(v2_dir, dsa_dir): same decoder weights; dsa_dir adds the V3.2
    indexer config + random indexer weights."""
    import torch
    from safetensors import safe_open
    from safetensors.numpy import save_file
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(11)
    cfg = DeepseekV2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        q_lora_rank=48,  # the indexer consumes q_lora
        kv_lora_rank=32,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        max_position_embeddings=256,
        head_dim=24,
    )
    model = DeepseekV2ForCausalLM(cfg)
    model.eval()
    v2_dir = tmp_path_factory.mktemp("tiny_dsv2_qlora")
    model.save_pretrained(v2_dir, safe_serialization=True)

    dsa_dir = str(tmp_path_factory.mktemp("tiny_dsv32"))
    h, d = 2, 16
    rng = np.random.default_rng(0)
    tensors = {}
    with safe_open(os.path.join(v2_dir, "model.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    for l in range(cfg.num_hidden_layers):
        p = f"model.layers.{l}.self_attn.indexer"
        tensors[f"{p}.wq_b.weight"] = (
            rng.normal(0, 0.1, size=(h * d, cfg.q_lora_rank))
        ).astype(np.float32)
        tensors[f"{p}.wk.weight"] = (
            rng.normal(0, 0.1, size=(d, cfg.hidden_size))
        ).astype(np.float32)
        tensors[f"{p}.weights_proj.weight"] = (
            rng.normal(0, 0.1, size=(h, cfg.hidden_size))
        ).astype(np.float32)
        tensors[f"{p}.k_norm.weight"] = np.ones(d, np.float32)
        tensors[f"{p}.k_norm.bias"] = np.zeros(d, np.float32)
    for fn in os.listdir(v2_dir):
        if not fn.endswith(".safetensors"):
            shutil.copy(os.path.join(v2_dir, fn), dsa_dir)
    save_file(tensors, os.path.join(dsa_dir, "model.safetensors"))
    c = json.load(open(os.path.join(dsa_dir, "config.json")))
    c["architectures"] = ["DeepseekV32ForCausalLM"]
    c["index_n_heads"] = h
    c["index_head_dim"] = d
    c["index_topk"] = 1 << 20  # per-test override below
    json.dump(c, open(os.path.join(dsa_dir, "config.json"), "w"))
    return str(v2_dir), dsa_dir


def _greedy(model_dir, prompt, n_new, **kw):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=2048, **kw,
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("q", list(prompt), sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids, runner


def _with_topk(dsa_dir, tmp_path, topk, name):
    d = str(tmp_path / name)
    shutil.copytree(dsa_dir, d)
    c = json.load(open(os.path.join(d, "config.json")))
    c["index_topk"] = topk
    json.dump(c, open(os.path.join(d, "config.json"), "w"))
    return d


def test_dsa_pool_and_dense_shortcircuit(tiny_dsa_dirs, tmp_path):
    """index_topk >= padded context: the dense short-circuit runs and the
    DSA model matches plain V2 (same decoder weights) exactly; the layer
    tuple carries the index-K pool in its second slot."""
    v2_dir, dsa_dir = tiny_dsa_dirs
    big = _with_topk(dsa_dir, tmp_path, 1 << 20, "dsa_big_topk")
    prompt = [3, 17, 92, 45, 6, 88, 21, 101, 9, 54]
    ref, _ = _greedy(v2_dir, prompt, 8)
    ours, runner = _greedy(big, prompt, 8)
    assert ours == ref, f"ours={ours} ref={ref}"
    latent, idx_pool = runner.kv_pool.kv[0]
    assert idx_pool is not None
    assert idx_pool.shape[2:] == (2, 16 // 2)
    assert runner.kv_pool.config.dsa_index_dim == 16


def test_dsa_sparse_path_full_selection_parity(tiny_dsa_dirs, tmp_path):
    """padded C > index_topk >= true seq len: the sparse path RUNS (no
    short-circuit) but selects every valid position -> same tokens."""
    v2_dir, dsa_dir = tiny_dsa_dirs
    prompt = [(i * 7) % 120 + 3 for i in range(18)]
    n_new = 6
    # page_size=4, 18+6=24 tokens -> 6 pages; page bucket pads beyond ->
    # padded C >= 32 > topk=28 >= 24 live positions.
    small = _with_topk(dsa_dir, tmp_path, 28, "dsa_topk28")
    ref, _ = _greedy(v2_dir, prompt, n_new)
    ours, _ = _greedy(small, prompt, n_new)
    assert ours == ref, f"ours={ours} ref={ref}"


def test_dsa_truly_sparse_runs(tiny_dsa_dirs, tmp_path):
    """index_topk < live context: attention really drops tokens. The run
    must complete and stay deterministic across two identical runs."""
    _, dsa_dir = tiny_dsa_dirs
    sparse = _with_topk(dsa_dir, tmp_path, 8, "dsa_topk8")
    prompt = [(i * 11) % 120 + 3 for i in range(30)]
    a, _ = _greedy(sparse, prompt, 8)
    b, _ = _greedy(sparse, prompt, 8)
    assert a == b
    assert len(a) == 8


def test_dsa_decode_oracle():
    """forward_dsa_decode == numpy oracle: relu head-gated scoring,
    top-k selection, sparse gather, masked MQA softmax."""
    import jax.numpy as jnp

    from sglang_tpu.model_exec.forward_batch import ForwardBatch, ForwardMode
    from sglang_tpu.ops.attention.xla_backend import XlaNativeBackend

    rng = np.random.default_rng(3)
    B, nh, D, d, h = 2, 3, 24, 8, 2
    ps, P = 4, 8
    C = ps * P
    K = 6
    v_dim = 16
    seq_lens = np.array([13, 9], np.int32)

    latent = rng.normal(size=(P * B + 2, ps, 2, D // 2)).astype(np.float32)
    idx_pool = rng.normal(size=(P * B + 2, ps, 2, d // 2)).astype(np.float32)
    page_table = np.stack([
        np.arange(P, dtype=np.int32),
        np.arange(P, 2 * P, dtype=np.int32),
    ])
    q = rng.normal(size=(B, nh, D)).astype(np.float32)
    idx_q = rng.normal(size=(B, h, d)).astype(np.float32)
    gates = rng.normal(size=(B, h)).astype(np.float32)

    backend = XlaNativeBackend.__new__(XlaNativeBackend)
    backend.page_size = ps
    backend.kv_quant = None
    backend.dcp = False

    fb = ForwardBatch(
        input_ids=jnp.zeros(B, jnp.int32),
        positions=jnp.asarray(seq_lens - 1),
        seq_ids=jnp.arange(B, dtype=jnp.int32),
        seq_lens=jnp.asarray(seq_lens),
        q_lens=jnp.ones(B, jnp.int32),
        prefix_lens=jnp.asarray(seq_lens - 1),
        page_table=jnp.asarray(page_table),
        out_cache_loc=jnp.zeros(B, jnp.int32),
        req_slots=jnp.arange(B, dtype=jnp.int32),
        logits_indices=jnp.arange(B, dtype=jnp.int32),
        num_seqs=jnp.int32(B),
        cu_q_lens=jnp.arange(B + 1, dtype=jnp.int32),
        block_seq=jnp.zeros(1, jnp.int32),
        block_q_off=jnp.zeros(1, jnp.int32),
        mode=ForwardMode.DECODE,
    )
    out = np.asarray(
        backend.forward_dsa_decode(
            jnp.asarray(q), jnp.asarray(latent), jnp.asarray(idx_pool),
            jnp.asarray(idx_q), jnp.asarray(gates), fb,
            v_dim=v_dim, scale=0.3, index_topk=K,
        )
    )

    # numpy oracle
    lat_flat = latent.reshape(-1, D)
    ik_flat = idx_pool.reshape(-1, d)
    for b in range(B):
        slots = (page_table[b][:, None] * ps + np.arange(ps)).reshape(-1)
        ik = ik_flat[slots]  # [C, d]
        s = np.maximum(idx_q[b] @ ik.T, 0.0)  # [h, C]
        score = gates[b] @ s  # [C]
        score[seq_lens[b]:] = -np.inf
        sel = np.argsort(-score, kind="stable")[:K]
        sel = sel[score[sel] > -np.inf]
        rows = lat_flat[slots[sel]]  # [k, D]
        att = q[b] @ rows.T * 0.3  # [nh, k]
        p = np.exp(att - att.max(axis=-1, keepdims=True))
        p /= p.sum(axis=-1, keepdims=True)
        o = p @ rows[:, :v_dim]
        np.testing.assert_allclose(out[b], o, rtol=2e-4, atol=2e-5)
