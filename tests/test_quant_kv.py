"""fp8 KV cache: packing, in-kernel byte decode, end-to-end generation.

Ref behavior: --kv-cache-dtype fp8_e5m2|fp8_e4m3
(srt/layers/quantization/kv_cache.py). Storage design: ops/quant_kv.py.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("fmt", ["fp8_e5m2", "fp8_e4m3"])
def test_pack_unpack_roundtrip(fmt):
    import jax.numpy as jnp
    import ml_dtypes

    from sglang_tpu.ops.quant_kv import F8_DTYPES, pack_f8, unpack_f8

    rng = np.random.default_rng(0)
    nk, hd = 4, 32
    x = rng.standard_normal((17, nk * hd)).astype(np.float32) * 3
    packed = np.asarray(pack_f8(jnp.asarray(x), nk, fmt))
    assert packed.shape == (17, nk * hd // 4)
    assert packed.dtype == np.int32
    out = np.asarray(
        unpack_f8(jnp.asarray(packed), nk, fmt, jnp.float32)
    ).reshape(17, nk * hd)
    # reference: direct f8 round trip
    np_dt = (ml_dtypes.float8_e5m2 if fmt == "fp8_e5m2"
             else ml_dtypes.float8_e4m3fn)
    want = x.astype(np_dt).astype(np.float32)
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("fmt", ["fp8_e5m2", "fp8_e4m3"])
def test_kernel_byte_decode_matches_f8_semantics(fmt):
    """The Pallas kernels' arithmetic byte decode must equal the real f8
    value for every finite byte pattern."""
    import jax.numpy as jnp
    import ml_dtypes

    from sglang_tpu.ops.attention.pallas_kernels import _decode_f8_bytes

    all_bytes = np.arange(256, dtype=np.int32).reshape(16, 16)
    got = np.asarray(_decode_f8_bytes(jnp.asarray(all_bytes), fmt))
    np_dt = (ml_dtypes.float8_e5m2 if fmt == "fp8_e5m2"
             else ml_dtypes.float8_e4m3fn)
    want = all_bytes.astype(np.uint8).view(np_dt).astype(np.float32)
    finite = np.isfinite(want)
    np.testing.assert_array_equal(got[finite], want[finite])


@pytest.mark.parametrize("backend", ["xla_native", "pallas"])
def test_fp8_kv_pool_contents_and_generation(tiny_llama_dir, backend):
    """Through the REAL model + scheduler: the quantized pool must hold
    exactly the f8 round-trip of what the bf16 pool holds at the same
    slots, and generation must run end-to-end."""
    import jax.numpy as jnp
    import ml_dtypes

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.ops.quant_kv import unpack_f8
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompt = [3, 11, 7, 5, 2, 9]

    def run(kv_dtype):
        args = ServerArgs(
            model_path=tiny_llama_dir,
            dtype="float32",
            attention_backend=backend,
            page_size=4,
            max_total_tokens=2048,
            kv_cache_dtype=kv_dtype,
        )
        runner = ModelRunner(args)
        core = ScheduleCore(args, runner)
        sp = SamplingParams(temperature=0.0, max_new_tokens=4,
                            ignore_eos=True, )
        sp.normalize()
        req = Req("r", list(prompt), sp)
        req.return_logprob = True
        core.add_request(req)
        while core.has_work():
            core.step()
        return req, runner

    ref_req, ref_runner = run("auto")
    out_req, out_runner = run("fp8_e5m2")
    assert len(out_req.output_ids) == 4
    assert all(np.isfinite(lp) for lp in out_req.output_logprobs)

    # Same page allocation order in both runs: compare the prompt's KV.
    nk = ref_runner.model_config.num_key_value_heads
    hd = ref_runner.model_config.head_dim
    ps = 4
    slots = np.arange(ps, ps + len(prompt))  # first allocated page is 1
    # Only layer 0 is comparable: deeper layers legitimately diverge (their
    # inputs already passed through fp8 attention in the quant run).
    for layer in [0]:
        kp_ref = np.asarray(
            ref_runner.kv_pool.kv[layer][0][slots // ps, slots % ps],
            np.float32,
        ).reshape(len(prompt), nk * hd)
        kp_q = np.asarray(
            unpack_f8(
                out_runner.kv_pool.kv[layer][0][slots // ps, slots % ps],
                nk, "fp8_e5m2", jnp.float32,
            )
        ).reshape(len(prompt), nk * hd)
        want = kp_ref.astype(ml_dtypes.float8_e5m2).astype(np.float32)
        # double rounding (f32 -> f8 vs f32 -> bf16-pool -> f8) can move a
        # rare value by one f8 ulp; require near-total exact agreement.
        exact = np.mean(kp_q == want)
        assert exact > 0.98, (layer, exact)


def test_fp8_kv_radix_reuse(tiny_llama_dir):
    """Prefix reuse + chunked paths still work with a quantized pool."""
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    args = ServerArgs(
        model_path=tiny_llama_dir,
        dtype="float32",
        attention_backend="xla_native",
        page_size=4,
        max_total_tokens=2048,
        kv_cache_dtype="fp8_e4m3",
    )
    runner = ModelRunner(args)
    core = ScheduleCore(args, runner)

    def gen(rid, prompt):
        sp = SamplingParams(temperature=0.0, max_new_tokens=5,
                            ignore_eos=True)
        sp.normalize()
        req = Req(rid, list(prompt), sp)
        core.add_request(req)
        while core.has_work():
            core.step()
        return req

    prompt = [3, 11, 7, 5, 2, 9, 4, 8]
    r1 = gen("a", prompt)
    r2 = gen("b", prompt)
    assert r2.output_ids == r1.output_ids
    assert r2.cached_report > 0  # radix hit on the quantized pool


def test_fp8_native_pool_matches_packed(tiny_llama_dir, monkeypatch):
    """SGLANG_TPU_F8_NATIVE=1 (mem/kv_pool.py quant_native): pools store
    float8 arrays in the bf16 layout and the XLA backend reads them with
    gather+convert. Same f8 values as the int32-packed transport — tokens
    and logprobs must match the packed run exactly."""
    import jax.numpy as jnp

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    prompt = [3, 11, 7, 5, 2, 9, 4, 8, 6, 1]

    def run(native: bool):
        monkeypatch.setenv("SGLANG_TPU_F8_NATIVE", "1" if native else "0")
        args = ServerArgs(
            model_path=tiny_llama_dir,
            dtype="float32",
            attention_backend="xla_native",
            page_size=4,
            max_total_tokens=2048,
            kv_cache_dtype="fp8_e5m2",
        )
        runner = ModelRunner(args)
        core = ScheduleCore(args, runner)
        sp = SamplingParams(temperature=0.0, max_new_tokens=6,
                            ignore_eos=True)
        sp.normalize()
        req = Req("r", list(prompt), sp)
        req.return_logprob = True
        core.add_request(req)
        while core.has_work():
            core.step()
        return req, runner

    packed_req, _ = run(False)
    native_req, native_runner = run(True)
    # storage really is float8 in the bf16 layout
    k0 = native_runner.kv_pool.kv[0][0]
    assert k0.dtype == jnp.float8_e5m2 and k0.ndim == 4
    assert native_req.output_ids == packed_req.output_ids
    np.testing.assert_allclose(
        np.asarray(native_req.output_logprobs, np.float32),
        np.asarray(packed_req.output_logprobs, np.float32),
        rtol=2e-4, atol=2e-5,
    )

