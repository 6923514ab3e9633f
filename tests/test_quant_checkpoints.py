"""Pre-quantized checkpoint loading (AWQ / GPTQ / compressed-tensors /
fp8-block): pack->dequant roundtrips and end-to-end generation
equivalence against a dense checkpoint holding the same dequantized
values. Ref: srt/layers/quantization/{awq,gptq,compressed_tensors}."""

import json
import os
import shutil

import numpy as np
import pytest

from sglang_tpu.quantization.checkpoint_formats import (
    dequant_awq,
    dequant_gptq,
    dequantize_stream,
    load_checkpoint_quant_config,
    pack_awq,
    pack_gptq,
)


def _asym_quant(w_t: np.ndarray, group: int, bits: int = 4):
    """w_t [in, out] -> (q, z, s) with per-(group x out-col) asym scales."""
    n_in, n_out = w_t.shape
    qmax = (1 << bits) - 1
    wg = w_t.reshape(n_in // group, group, n_out)
    wmin = wg.min(axis=1)
    wmax = wg.max(axis=1)
    s = np.maximum((wmax - wmin) / qmax, 1e-8)
    z = np.clip(np.round(-wmin / s), 0, qmax)
    q = np.clip(
        np.round(wg / s[:, None, :]) + z[:, None, :], 0, qmax
    ).astype(np.int32)
    return q.reshape(n_in, n_out), z.astype(np.int32), s.astype(np.float32)


def test_awq_pack_dequant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)  # [in, out]
    q, z, s = _asym_quant(w, group=16)
    packed = pack_awq(q, z, s)
    assert packed["qweight"].shape == (64, 4)
    deq = dequant_awq(packed["qweight"], packed["qzeros"], packed["scales"])
    expect = (q - np.repeat(z, 16, axis=0)) * np.repeat(
        packed["scales"].astype(np.float32), 16, axis=0
    )
    np.testing.assert_allclose(deq, expect, rtol=0, atol=0)


@pytest.mark.parametrize("v2", [False, True])
def test_gptq_pack_dequant_roundtrip(v2):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    q, z, s = _asym_quant(w, group=16)
    # v1 stores z-1: keep z >= 1 so the packed value stays in [0, 15]
    if not v2:
        z = np.maximum(z, 1)
    packed = pack_gptq(q, z, s, v2=v2)
    assert packed["qweight"].shape == (8, 32)
    deq = dequant_gptq(
        packed["qweight"], packed["qzeros"], packed["scales"], None, v2=v2
    )
    expect = (q - np.repeat(z, 16, axis=0)) * np.repeat(
        packed["scales"].astype(np.float32), 16, axis=0
    )
    np.testing.assert_allclose(deq, expect, rtol=0, atol=0)


def test_gptq_desc_act_g_idx():
    rng = np.random.default_rng(2)
    n_in, n_out, group = 64, 32, 16
    w = rng.normal(size=(n_in, n_out)).astype(np.float32)
    q, z, s = _asym_quant(w, group=group)
    z = np.maximum(z, 1)
    # Scramble row->group assignment (activation-order checkpoints).
    g_idx = rng.permutation(np.repeat(np.arange(n_in // group), group))
    packed = pack_gptq(q, z, s)
    deq = dequant_gptq(
        packed["qweight"], packed["qzeros"], packed["scales"],
        g_idx.astype(np.int32),
    )
    expect = (q - z[g_idx]) * packed["scales"].astype(np.float32)[g_idx]
    np.testing.assert_allclose(deq, expect, rtol=0, atol=0)


def test_compressed_tensors_stream():
    rng = np.random.default_rng(3)
    w8 = rng.integers(-127, 127, size=(32, 64), dtype=np.int8)
    scale = rng.uniform(0.01, 0.1, size=(32, 1)).astype(np.float32)
    norm = rng.normal(size=(64,)).astype(np.float32)
    stream = [
        ("model.layers.0.self_attn.q_proj.weight", w8),
        ("model.layers.0.self_attn.q_proj.weight_scale", scale),
        ("model.layers.0.input_layernorm.weight", norm),
    ]
    out = dict(dequantize_stream(iter(stream), {"method": "compressed-tensors"}))
    np.testing.assert_allclose(
        out["model.layers.0.self_attn.q_proj.weight"],
        w8.astype(np.float32) * scale,
    )
    # dense float tensors pass through untouched
    np.testing.assert_array_equal(
        out["model.layers.0.input_layernorm.weight"], norm
    )


def test_fp8_block_stream():
    import ml_dtypes

    rng = np.random.default_rng(4)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    wq = w.astype(ml_dtypes.float8_e4m3fn)
    sinv = rng.uniform(0.5, 2.0, size=(2, 2)).astype(np.float32)  # 32x64 blocks
    stream = [
        ("model.layers.0.mlp.down_proj.weight", wq),
        ("model.layers.0.mlp.down_proj.weight_scale_inv", sinv),
    ]
    out = dict(
        dequantize_stream(
            iter(stream), {"method": "fp8", "weight_block_size": [32, 64]}
        )
    )
    deq = out["model.layers.0.mlp.down_proj.weight"]
    expect = wq.astype(np.float32) * np.repeat(
        np.repeat(sinv, 32, axis=0), 64, axis=1
    )
    np.testing.assert_allclose(deq, expect)


# ---------------------------------------------------------------- e2e


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


def _awqify_checkpoint(src_dir, dst_dir, group=16):
    """Rewrite every decoder linear weight of a dense HF llama checkpoint
    as AWQ-packed tensors; also write a dense twin holding the exact
    dequantized values. Returns (awq_dir, dense_twin_dir)."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    linear_suffixes = (
        "q_proj.weight", "k_proj.weight", "v_proj.weight", "o_proj.weight",
        "gate_proj.weight", "up_proj.weight", "down_proj.weight",
    )
    src = os.path.join(src_dir, "model.safetensors")
    awq_tensors, dense_tensors = {}, {}
    with safe_open(src, framework="np") as f:
        for name in f.keys():
            arr = f.get_tensor(name)
            if name.endswith(linear_suffixes) and arr.ndim == 2:
                w_t = arr.astype(np.float32).T  # [in, out]
                q, z, s = _asym_quant(w_t, group=group)
                packed = pack_awq(q, z, s)
                mod = name[: -len(".weight")]
                for suf, t in packed.items():
                    awq_tensors[f"{mod}.{suf}"] = t
                deq = dequant_awq(
                    packed["qweight"], packed["qzeros"], packed["scales"]
                )
                # ascontiguousarray: safetensors 0.8 writes the raw
                # buffer assuming C order; .T is F-ordered.
                dense_tensors[name] = np.ascontiguousarray(
                    deq.T.astype(np.float32)
                )
            else:
                awq_tensors[name] = arr
                dense_tensors[name] = arr
    for d, tensors, qc in (
        (dst_dir + "_awq", awq_tensors,
         {"quant_method": "awq", "bits": 4, "group_size": group,
          "version": "gemm"}),
        (dst_dir + "_dense", dense_tensors, None),
    ):
        os.makedirs(d, exist_ok=True)
        for fn in os.listdir(src_dir):
            if fn.endswith(".safetensors"):
                continue
            shutil.copy(os.path.join(src_dir, fn), d)
        cfg = json.load(open(os.path.join(src_dir, "config.json")))
        if qc:
            cfg["quantization_config"] = qc
        else:
            cfg.pop("quantization_config", None)
        json.dump(cfg, open(os.path.join(d, "config.json"), "w"))
        save_file(tensors, os.path.join(d, "model.safetensors"))
    return dst_dir + "_awq", dst_dir + "_dense"


def test_awq_checkpoint_end_to_end(tiny_llama_dir, tmp_path):
    awq_dir, dense_dir = _awqify_checkpoint(
        tiny_llama_dir, str(tmp_path / "ckpt")
    )
    assert load_checkpoint_quant_config(awq_dir)["method"] == "awq"
    prompt = [(i * 5) % 250 + 2 for i in range(12)]
    toks_awq = _greedy(awq_dir, prompt, 8)
    toks_dense = _greedy(dense_dir, prompt, 8)
    assert toks_awq == toks_dense, (toks_awq, toks_dense)


# ------------------------------------------------------ mxfp4 / modelopt / bnb

def test_mxfp4_stream_roundtrip():
    """mxfp4 (gpt-oss native, ref layers/quantization/mxfp4.py): e2m1
    codes * ue8m0 group scales dequantize exactly; expert stacks come
    back in the HF dense layout (contraction dim before output dim)."""
    from sglang_tpu.quantization.checkpoint_formats import (
        FP4_LUT, dequantize_stream, pack_mxfp4,
    )

    rng = np.random.default_rng(7)
    E, O, K = 2, 8, 64  # expert stack, out rows, contraction
    codes = rng.integers(0, 16, size=(E, O, K // 32, 32))
    exps = rng.integers(-4, 5, size=(E, O, K // 32))
    packed = pack_mxfp4(codes, exps)
    stream = [
        ("model.layers.0.mlp.experts.gate_up_proj_blocks", packed["blocks"]),
        ("model.layers.0.mlp.experts.gate_up_proj_scales", packed["scales"]),
        ("model.layers.0.norm.weight", np.ones(4, np.float32)),
    ]
    out = dict(dequantize_stream(iter(stream), {"method": "mxfp4"}))
    expect = (FP4_LUT[codes] * np.exp2(exps)[..., None]).reshape(E, O, K)
    got = out["model.layers.0.mlp.experts.gate_up_proj"]
    assert got.shape == (E, K, O)  # HF dense expert layout
    np.testing.assert_allclose(got, np.swapaxes(expect, -1, -2))
    np.testing.assert_array_equal(
        out["model.layers.0.norm.weight"], np.ones(4, np.float32)
    )


def test_mxfp4_quantize_dequant_close():
    from sglang_tpu.quantization.checkpoint_formats import (
        dequant_mxfp4, quantize_mxfp4,
    )

    rng = np.random.default_rng(8)
    w = rng.normal(size=(16, 128)).astype(np.float32)
    t = quantize_mxfp4(w)
    deq = dequant_mxfp4(t["blocks"], t["scales"])
    # e2m1 with power-of-2 group scale: worst-case relative step ~25%
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < 0.2, err


def test_modelopt_fp8_stream():
    import ml_dtypes

    from sglang_tpu.quantization.checkpoint_formats import dequantize_stream

    rng = np.random.default_rng(9)
    w = (rng.normal(size=(32, 64)) * 0.1).astype(ml_dtypes.float8_e4m3fn)
    scale = np.float32(0.37)
    stream = [
        ("model.layers.0.self_attn.q_proj.weight", w),
        ("model.layers.0.self_attn.q_proj.weight_scale", scale),
        ("model.layers.0.self_attn.q_proj.input_scale", np.float32(1.0)),
        ("model.norm.weight", np.ones(4, np.float32)),
    ]
    out = dict(dequantize_stream(
        iter(stream), {"method": "modelopt", "algo": "FP8"}
    ))
    np.testing.assert_allclose(
        out["model.layers.0.self_attn.q_proj.weight"],
        w.astype(np.float32) * 0.37,
    )
    np.testing.assert_array_equal(out["model.norm.weight"],
                                  np.ones(4, np.float32))


def test_modelopt_nvfp4_stream():
    from sglang_tpu.quantization.checkpoint_formats import (
        FP4_LUT, dequantize_stream, pack_nvfp4,
    )

    rng = np.random.default_rng(10)
    O, K = 16, 64
    codes = rng.integers(0, 16, size=(O, K))
    gs = rng.uniform(0.25, 2.0, size=(O, K // 16)).astype(np.float32)
    packed = pack_nvfp4(codes, gs, 0.5)
    stream = [
        ("model.layers.0.mlp.up_proj.weight", packed["weight"]),
        ("model.layers.0.mlp.up_proj.weight_scale", packed["weight_scale"]),
        ("model.layers.0.mlp.up_proj.weight_scale_2",
         packed["weight_scale_2"]),
    ]
    out = dict(dequantize_stream(
        iter(stream), {"method": "modelopt", "algo": "NVFP4"}
    ))
    # scales round-trip through f8e4m3 (the serialized dtype)
    gs_f8 = packed["weight_scale"].astype(np.float32)
    expect = FP4_LUT[codes] * np.repeat(gs_f8, 16, axis=1) * 0.5
    np.testing.assert_allclose(
        out["model.layers.0.mlp.up_proj.weight"], expect, rtol=1e-6
    )


@pytest.mark.parametrize("nested", [False, True])
def test_bnb_nf4_stream(nested):
    """BitsAndBytes 4-bit (ref model_loader/loader.py BitsAndBytesModelLoader):
    packed nf4 + blockwise absmax (+ double quantization) round-trips
    through the stream dequantizer."""
    from sglang_tpu.quantization.checkpoint_formats import (
        NF4_CODE, dequantize_stream, pack_bnb4,
    )

    rng = np.random.default_rng(11)
    O, K, BS = 8, 64, 64
    n = O * K
    idx = rng.integers(0, 16, size=n)
    absmax = rng.uniform(0.1, 3.0, size=n // BS).astype(np.float32)
    tensors = pack_bnb4(idx, absmax, (O, K), blocksize=BS, nested=nested)
    mod = "model.layers.0.self_attn.q_proj"
    stream = [(f"{mod}.{k}", v) for k, v in tensors.items()]
    stream.append(("model.norm.weight", np.ones(4, np.float32)))
    out = dict(dequantize_stream(
        iter(stream), {"method": "bitsandbytes", "quant_type": "nf4"}
    ))
    got = out[f"{mod}.weight"]
    assert got.shape == (O, K)
    if nested:
        # double-quantized absmax is lossy (8-bit): bound the error
        expect = (NF4_CODE[idx].reshape(-1, BS)
                  * absmax[:, None]).reshape(O, K)
        assert np.abs(got - expect).max() <= np.abs(expect).max() * 0.02
    else:
        expect = (NF4_CODE[idx].reshape(-1, BS)
                  * absmax[:, None]).reshape(O, K)
        np.testing.assert_allclose(got, expect, rtol=1e-6)
    np.testing.assert_array_equal(out["model.norm.weight"],
                                  np.ones(4, np.float32))
