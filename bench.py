"""Benchmark: serving-style decode throughput through the full scheduler.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: Llama-3.2-1B-shaped model (dummy weights — no checkpoints in the
image), 64 concurrent requests, 512-token prompts, 128 output tokens,
continuous batching through ScheduleCore with the production attention
backend for the platform. vs_baseline compares output tok/s against the
reference CI gate (3800 tok/s, Llama-8B-class on a 32GB GPU —
test/registered/perf/test_bench_serving_1gpu_part1.py:38-43); an
8B-on-v5e-8 calibration replaces this once multi-chip hardware is wired.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_TOK_S = 3800.0


def main():
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    # Llama-3.2-1B shape
    config = ModelConfig(
        architectures=["LlamaForCausalLM"],
        vocab_size=128256,
        hidden_size=2048,
        num_hidden_layers=16,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=64,
        intermediate_size=8192,
        context_length=4096,
        rope_theta=500000.0,
        dtype=jnp.bfloat16,
    )
    import os

    args = ServerArgs(
        model_path="__bench_dummy__",
        load_format="dummy",
        page_size=64,
        max_running_requests=256,
        max_total_tokens=262144,
        chunked_prefill_size=8192,
        random_seed=0,
        # fp8 KV is the production-recommended config on this hardware
        # (+16% decode; exact-byte storage, see PERF_NOTES.md). Override
        # with BENCH_KV_DTYPE=auto for the bf16 comparison run.
        kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", "fp8_e5m2"),
    )
    runner = ModelRunner(args, model_config=config)
    core = ScheduleCore(args, runner)

    rng = np.random.default_rng(0)
    n_reqs = 256
    prompt_len = 512
    out_len = 128
    shared_prefix = rng.integers(2, 60000, size=128).tolist()
    reqs = []
    for i in range(n_reqs):
        prompt = shared_prefix + rng.integers(2, 60000, size=prompt_len - 128).tolist()
        sp = SamplingParams(
            temperature=0.0, max_new_tokens=out_len, ignore_eos=True
        )
        sp.normalize()
        reqs.append(Req(f"bench-{i}", prompt, sp))

    # Warmup: run the EXACT workload once (untimed) so every bucket shape
    # (prefill token buckets, decode batch buckets, page-table buckets as
    # sequences grow) is compiled — the TPU analog of CUDA-graph capture.
    warm_reqs = []
    for i in range(n_reqs):
        prompt = shared_prefix + rng.integers(
            2, 60000, size=prompt_len - 128
        ).tolist()
        sp = SamplingParams(temperature=0.0, max_new_tokens=out_len,
                            ignore_eos=True)
        sp.normalize()
        warm_reqs.append(Req(f"warm-{i}", prompt, sp))
    for r in warm_reqs:
        core.add_request(r)
    while core.has_work():
        core.step()
    core.flush_cache()

    t0 = time.perf_counter()
    for r in reqs:
        core.add_request(r)
    done_tokens = 0
    while core.has_work():
        outs = core.step()
        done_tokens += len(outs)
    elapsed = time.perf_counter() - t0
    total_out = sum(len(r.output_ids) for r in reqs)
    tok_s = total_out / elapsed

    print(
        json.dumps(
            {
                "metric": "output_tokens_per_sec_1b_dummy",
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
