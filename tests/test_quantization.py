"""Weight quantization: int8/fp8 storage, fused-dequant matmul, e2e parity.

Ref behavior: srt/layers/quantization/{fp8.py,w8a8_int8.py} — weight-only
and dynamic-activation quantized linear layers behind --quantization.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def test_quantize_roundtrip_int8():
    from sglang_tpu.quantization import quantize_np

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qw, scale = quantize_np(w, "int8", (0,))
    assert qw.dtype == np.int8 and scale.shape == (32,)
    deq = qw.astype(np.float32) * scale[None, :]
    # per-channel symmetric int8: worst-case error is scale/2
    assert np.max(np.abs(deq - w)) <= np.max(scale) / 2 + 1e-6


def test_quantize_roundtrip_fp8():
    from sglang_tpu.quantization import quantize_np

    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qw, scale = quantize_np(w, "fp8", (0,))
    deq = qw.astype(np.float32) * scale[None, :]
    rel = np.abs(deq - w) / (np.abs(w) + 1e-3)
    assert np.median(rel) < 0.05


def test_dequant_matmul_matches_dense():
    from sglang_tpu.quantization import dequant_matmul, quantize_np

    rng = np.random.default_rng(2)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    qw, scale = quantize_np(w, "int8", (0,))
    y = np.asarray(
        dequant_matmul(jnp.asarray(x), jnp.asarray(qw), jnp.asarray(scale),
                       "int8")
    )
    ref = x @ (qw.astype(np.float32) * scale[None, :])
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-3)


def test_w8a8_matmul_close_to_dense():
    from sglang_tpu.quantization import dequant_matmul, quantize_np

    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    qw, scale = quantize_np(w, "w8a8_int8", (0,))
    y = np.asarray(
        dequant_matmul(jnp.asarray(x), jnp.asarray(qw), jnp.asarray(scale),
                       "w8a8_int8")
    )
    ref = x @ w
    # int8 activations: expect ~1% relative error on random gaussians
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


@pytest.mark.parametrize("method", ["int8", "fp8", "w8a8_int8", "int4"])
def test_llama_e2e_quantized_close_to_bf16(tiny_llama_dir, method):
    """A quantized tiny-llama server path produces outputs close to the
    bf16 path (same checkpoint, greedy logits cosine similarity)."""
    import jax

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.quantization import set_quant_method
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompt = [3, 17, 92, 45, 6, 88, 21, 101]

    def run(quantization):
        args = ServerArgs(
            model_path=tiny_llama_dir,
            page_size=16,
            max_total_tokens=4096,
            max_running_requests=8,
            quantization=quantization,
        )
        runner = ModelRunner(args)
        core = ScheduleCore(args, runner)
        sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
        sp.normalize()
        req = Req(f"q-{quantization}", list(prompt), sp)
        core.add_request(req)
        while core.has_work():
            core.step()
        set_quant_method(None)  # reset process-global state
        return req.output_ids

    ref = run(None)
    out = run(method)
    assert len(out) == len(ref)
    if method not in ("w8a8_int8", "int4"):
        # Tiny random checkpoints amplify quant noise; require the greedy
        # path to agree on half the tokens for the weight-only methods.
        # (w8a8's dynamic int8 activations and int4's 4-bit grid add too
        # much noise for a token-agreement bound on a random tiny model —
        # the matmul-level tests above pin their numerics instead.)
        agree = sum(1 for a, b in zip(ref, out) if a == b)
        assert agree >= len(ref) // 2, (ref, out)


def test_quantized_specs_and_param_tree(tiny_llama_dir):
    """Quantized load produces int8 weights + /qscale companions."""
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.quantization import set_quant_method
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        page_size=16,
        max_total_tokens=2048,
        quantization="int8",
    )
    runner = ModelRunner(args)
    qnames = [n for n in runner.params if n.endswith("/qscale")]
    assert qnames, "no quantized params materialized"
    base = qnames[0][: -len("/qscale")]
    assert runner.params[base].dtype == jnp.int8
    assert runner.params[qnames[0]].dtype == jnp.float32
    set_quant_method(None)


def test_int4_matmul_and_storage():
    """int4 weight-only: native s4 storage, fused-dequant matmul error
    bounded by the per-channel grid step."""
    import jax

    from sglang_tpu.quantization import dequant_matmul, quantize_np

    rng = np.random.default_rng(4)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    qw, scale = quantize_np(w, "int4", (0,))
    assert qw.dtype == np.int8 and qw.shape == (64, 64)  # axis 0 halved
    assert scale.shape == (64,)
    y = np.asarray(
        dequant_matmul(jnp.asarray(x), jnp.asarray(qw),
                       jnp.asarray(scale), "int4")
    )
    # exact vs the dequantized-weight matmul (the quant error itself is
    # the grid step; the MATMUL must be exact against the stored nibbles)
    from sglang_tpu.quantization import unpack_int4

    wq = unpack_int4(qw, 0).astype(np.float32)
    ref = x @ (wq * scale[None, :])
    np.testing.assert_allclose(y, ref, rtol=2e-3, atol=2e-3)
    # pack/unpack roundtrip is exact
    np.testing.assert_array_equal(
        unpack_int4(qw, 0),
        np.clip(np.rint(w / np.maximum(
            np.abs(w).max(0, keepdims=True) / 7.0, 1e-8)), -7, 7
        ).astype(np.int8),
    )
