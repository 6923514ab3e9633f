"""GGUF checkpoint loading: codec roundtrips, container read/write,
name mapping + Q/K unpermute, and end-to-end generation parity vs the
dense HF checkpoint. Ref: srt/model_loader/loader.py GGUFModelLoader."""

import os

import numpy as np
import pytest

from sglang_tpu.quantization import gguf


@pytest.mark.parametrize("gt,codec_tol", [
    (gguf.GGML_F32, 0.0),
    (gguf.GGML_F16, 1e-3),
    (gguf.GGML_BF16, 2e-2),
    (gguf.GGML_Q8_0, 2e-2),
    (gguf.GGML_Q4_0, 0.3),
    (gguf.GGML_Q4_1, 0.2),
])
def test_codec_roundtrip(tmp_path, gt, codec_tol):
    rng = np.random.default_rng(gt)
    arr = rng.normal(size=(8, 64)).astype(np.float32)
    path = str(tmp_path / "t.gguf")
    gguf.write_gguf(path, {"general.architecture": "llama"},
                    {"t": (arr, gt)})
    gf = gguf.GGUFFile(path)
    got = gf.get("t")
    assert got.shape == arr.shape
    np.testing.assert_allclose(got, arr, rtol=0, atol=max(codec_tol, 1e-7))


def test_metadata_roundtrip(tmp_path):
    md = {
        "general.architecture": "llama",
        "llama.block_count": 2,
        "llama.rope.freq_base": 10000.0,
        "general.name": "tiny",
        "flag": True,
        "tokenizer.ggml.tokens": ["a", "b", "c"],
    }
    path = str(tmp_path / "m.gguf")
    gguf.write_gguf(path, md, {"x": (np.zeros((4, 32), np.float32),
                                     gguf.GGML_F32)})
    gf = gguf.GGUFFile(path)
    for k, v in md.items():
        assert gf.metadata[k] == v, k


def test_unpermute_inverts_hf_permute():
    """convert_hf_to_gguf.py permute(): HF -> llama.cpp order."""
    n_head, d, cols = 4, 16, 8
    rng = np.random.default_rng(3)
    w = rng.normal(size=(n_head * d, cols)).astype(np.float32)

    def hf_permute(weights, n):
        return (weights.reshape(n, 2, weights.shape[0] // n // 2,
                                *weights.shape[1:])
                .swapaxes(1, 2).reshape(weights.shape))

    back = gguf._unpermute_qk(hf_permute(w, n_head), n_head)
    np.testing.assert_array_equal(back, w)


def _ggufify(src_dir: str, dst: str, gt: int):
    """Convert the tiny HF llama checkpoint to a llama.cpp-style GGUF
    (names remapped, Q/K permuted, norms kept f32, big mats quantized)."""
    import json

    from safetensors import safe_open

    with open(os.path.join(src_dir, "config.json")) as f:
        cfg = json.load(f)
    n_head = cfg["num_attention_heads"]
    n_kv = cfg["num_key_value_heads"]

    def hf_permute(weights, n):
        return (weights.reshape(n, 2, weights.shape[0] // n // 2,
                                *weights.shape[1:])
                .swapaxes(1, 2).reshape(weights.shape))

    inv_blk = {v: k for k, v in gguf._BLK.items()}
    inv_direct = {v: k for k, v in gguf._DIRECT.items()}
    tensors = {}
    st = os.path.join(src_dir, "model.safetensors")
    with safe_open(st, framework="np") as sf:
        for name in sf.keys():
            arr = sf.get_tensor(name).astype(np.float32)
            if name in inv_direct:
                gname = inv_direct[name]
            elif name.startswith("model.layers."):
                _, _, idx, rest = name.split(".", 3)
                if rest not in inv_blk:
                    continue
                gname = f"blk.{idx}.{inv_blk[rest]}"
                if rest == "self_attn.q_proj.weight":
                    arr = hf_permute(arr, n_head)
                elif rest == "self_attn.k_proj.weight":
                    arr = hf_permute(arr, n_kv)
            else:
                continue
            use_gt = gt if (arr.ndim == 2 and arr.size % 32 == 0
                            and "norm" not in gname) else gguf.GGML_F32
            tensors[gname] = (arr, use_gt)
    md = {
        "general.architecture": "llama",
        "llama.embedding_length": cfg["hidden_size"],
        "llama.block_count": cfg["num_hidden_layers"],
        "llama.attention.head_count": n_head,
        "llama.attention.head_count_kv": n_kv,
        "llama.feed_forward_length": cfg["intermediate_size"],
        "llama.context_length": cfg["max_position_embeddings"],
        "llama.attention.layer_norm_rms_epsilon": cfg["rms_norm_eps"],
        "llama.rope.freq_base": cfg["rope_theta"],
    }
    gguf.write_gguf(dst, md, tensors)


def test_iter_hf_tensors_exact_f32(tiny_llama_dir, tmp_path):
    """F32 GGUF roundtrips to the exact original HF tensors."""
    from safetensors import safe_open

    path = str(tmp_path / "model.gguf")
    _ggufify(tiny_llama_dir, path, gguf.GGML_F32)
    got = dict(gguf.iter_hf_tensors(path))
    with safe_open(os.path.join(tiny_llama_dir, "model.safetensors"),
                   framework="np") as sf:
        for name in sf.keys():
            if "rotary" in name:
                continue
            assert name in got, name
            np.testing.assert_array_equal(
                got[name], sf.get_tensor(name).astype(np.float32)
            )


def test_config_from_gguf(tiny_llama_dir, tmp_path):
    path = str(tmp_path / "model.gguf")
    _ggufify(tiny_llama_dir, path, gguf.GGML_F32)
    cfg = gguf.config_from_gguf(path)
    assert cfg["hidden_size"] == 64
    assert cfg["num_hidden_layers"] == 2
    assert cfg["num_key_value_heads"] == 2
    assert cfg["vocab_size"] == 256
    assert cfg["tie_word_embeddings"] is False


def _greedy(model_dir, prompt, n_new):
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=model_dir, dtype="float32",
        attention_backend="xla_native", page_size=4,
        max_total_tokens=1024, max_running_requests=4,
    )
    core = ScheduleCore(args, ModelRunner(args))
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new,
                        ignore_eos=True)
    sp.normalize()
    req = Req("q", prompt, sp)
    core.add_request(req)
    while core.has_work():
        core.step()
    return req.output_ids


def test_gguf_checkpoint_end_to_end(tiny_llama_dir, tmp_path):
    """A GGUF dir (config.json + tokenizer alongside, like HF GGUF
    repos) generates the same greedy tokens as the safetensors dir."""
    import shutil

    gdir = str(tmp_path / "gguf_ckpt")
    os.makedirs(gdir)
    for f in os.listdir(tiny_llama_dir):
        if not f.endswith(".safetensors"):
            shutil.copy(os.path.join(tiny_llama_dir, f),
                        os.path.join(gdir, f))
    _ggufify(tiny_llama_dir, os.path.join(gdir, "model.gguf"),
             gguf.GGML_F32)
    prompt = [(i * 7) % 250 + 2 for i in range(12)]
    assert _greedy(gdir, prompt, 8) == _greedy(tiny_llama_dir, prompt, 8)
