"""Benchmark: serving-style decode throughput through the full scheduler.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Two configs run back to back (dummy weights — no checkpoints in the image):

  8b — Llama-3-8B shape (the NORTH STAR: BASELINE.md row 1's 3800 tok/s
       CI gate is 8B-class on a 32 GB GPU). int4 weights (~5.6 GB —
       bf16's 16 GB does not fit this 16 GB chip) + bf16 KV (the fp8
       pools' int32-unpack lowering costs more than the halved gather
       saves at 8B shapes — PERF_NOTES round 4), 128 concurrent
       requests, 512-token prompts, 128 output tokens.
  1b — Llama-3.2-1B shape, bf16 weights, 256 requests (the round-1/2
       trend metric, kept for continuity with PERF_NOTES.md).

The PRIMARY metric/vs_baseline is the 8B number (honest comparison
against the 8B gate); the 1B number rides in "extra". BENCH_ONLY=1b|8b
runs a single config for A/B work.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_TOK_S = 3800.0

CONFIGS = {
    "1b": dict(
        vocab_size=128256, hidden_size=2048, num_hidden_layers=16,
        num_attention_heads=32, num_key_value_heads=8, head_dim=64,
        intermediate_size=8192, n_reqs=256, quantization=None,
        max_total_tokens=262144, kv_dtype="fp8_e5m2",
    ),
    "8b": dict(
        vocab_size=128256, hidden_size=4096, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        intermediate_size=14336, n_reqs=128, quantization="int4",
        max_total_tokens=66560, kv_dtype="auto",
    ),
}

# A/B knobs: BENCH_QUANT overrides the 8b config's weight quantization
# (int8 | w8a8_int8 | fp8 | none); SGLANG_TPU_F8_NATIVE=1 switches fp8-KV
# pools to native-f8 storage (mem/kv_pool.py quant_native).
if os.environ.get("BENCH_QUANT"):
    _q = os.environ["BENCH_QUANT"]
    CONFIGS["8b"]["quantization"] = None if _q == "none" else _q


def run_config(name: str) -> float:
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    cfg = CONFIGS[name]
    config = ModelConfig(
        architectures=["LlamaForCausalLM"],
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg["num_key_value_heads"],
        head_dim=cfg["head_dim"],
        intermediate_size=cfg["intermediate_size"],
        context_length=4096,
        rope_theta=500000.0,
        dtype=jnp.bfloat16,
    )
    args = ServerArgs(
        model_path=f"__bench_dummy_{name}__",
        load_format="dummy",
        page_size=int(os.environ.get("BENCH_PAGE_SIZE", "64")),
        max_running_requests=cfg["n_reqs"],
        max_total_tokens=cfg["max_total_tokens"],
        chunked_prefill_size=8192,
        random_seed=0,
        quantization=cfg["quantization"],
        # Per-config KV dtype: the 1B keeps fp8 (its measured +16% win);
        # the 8B runs bf16 KV — at hd=128 shapes the fp8 unpack lowering
        # costs ~105 ms/step, far more than the halved gather saves
        # (PERF_NOTES round 4). Override with BENCH_KV_DTYPE for A/B.
        kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", cfg["kv_dtype"]),
    )
    runner = ModelRunner(args, model_config=config)
    core = ScheduleCore(args, runner)

    rng = np.random.default_rng(0)
    n_reqs = cfg["n_reqs"]
    prompt_len = 512
    out_len = 128
    shared_prefix = rng.integers(2, 60000, size=128).tolist()

    def make_reqs(tag):
        out = []
        for i in range(n_reqs):
            prompt = shared_prefix + rng.integers(
                2, 60000, size=prompt_len - 128
            ).tolist()
            sp = SamplingParams(
                temperature=0.0, max_new_tokens=out_len, ignore_eos=True
            )
            sp.normalize()
            out.append(Req(f"{tag}-{i}", prompt, sp))
        return out

    # Warmup: run the EXACT workload once (untimed) so every bucket shape
    # (prefill token buckets, decode batch buckets, page-table buckets as
    # sequences grow) is compiled — the TPU analog of CUDA-graph capture.
    for r in make_reqs("warm"):
        core.add_request(r)
    while core.has_work():
        core.step()
    core.flush_cache()

    reqs = make_reqs("bench")
    t0 = time.perf_counter()
    for r in reqs:
        core.add_request(r)
    while core.has_work():
        core.step()
    elapsed = time.perf_counter() - t0
    total_out = sum(len(r.output_ids) for r in reqs)
    return total_out / elapsed


def _run_isolated(name: str):
    """Run one config in a subprocess: TPU HBM from a finished config is
    only reliably released with the process (an 8B run would otherwise
    OOM the 1B run that follows it)."""
    import subprocess
    import sys

    env = dict(os.environ, BENCH_ONLY=name, _BENCH_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["extra"][name]
    raise RuntimeError(
        f"bench child failed: {proc.stderr.splitlines()[-3:] if proc.stderr else proc.returncode}"
    )


def main():
    only = os.environ.get("BENCH_ONLY")
    child = os.environ.get("_BENCH_CHILD")
    results = {}
    for name in ([only] if only else ["8b", "1b"]):
        try:
            if only and child:
                results[name] = round(run_config(name), 2)
            else:
                results[name] = _run_isolated(name)
        except Exception as e:  # OOM etc: report what we have
            results[name] = None
            results[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    primary = "8b" if results.get("8b") else "1b"
    val = results.get(primary) or 0.0
    print(
        json.dumps(
            {
                "metric": f"output_tokens_per_sec_{primary}_dummy",
                "value": val,
                "unit": "tok/s",
                "vs_baseline": round(val / BASELINE_TOK_S, 4),
                "extra": results,
            }
        )
    )


if __name__ == "__main__":
    main()
