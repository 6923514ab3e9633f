"""Offline single-batch latency/throughput benchmark.

Ref: python/sglang/benchmark/one_batch.py (bench_one_batch). Measures
prefill latency, decode latency and tok/s for fixed (batch, input, output)
shapes through the Engine, without HTTP.

    python -m sglang_tpu.bench_one_batch --model-path ... \
        --batch-size 8 --input-len 512 --output-len 64
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser("sglang-tpu bench_one_batch")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--input-len", type=int, default=512)
    parser.add_argument("--output-len", type=int, default=64)
    parser.add_argument("--warmup", type=int, default=1)
    from sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(parser)
    args = parser.parse_args(argv)

    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs as SA

    sa = SA.from_cli_args(args)
    runner = ModelRunner(sa)
    core = ScheduleCore(sa, runner)
    rng = np.random.default_rng(0)
    vocab = runner.model_config.vocab_size

    def run_once():
        reqs = []
        for i in range(args.batch_size):
            sp = SamplingParams(
                temperature=0.0, max_new_tokens=args.output_len,
                ignore_eos=True,
            )
            sp.normalize()
            reqs.append(
                Req(f"b{i}-{time.time_ns()}",
                    rng.integers(2, vocab - 2, size=args.input_len).tolist(),
                    sp)
            )
        t0 = time.perf_counter()
        for r in reqs:
            core.add_request(r)
        first_token_t = None
        while core.has_work():
            outs = core.step()
            if outs and first_token_t is None:
                first_token_t = time.perf_counter()
        total = time.perf_counter() - t0
        out_tokens = sum(len(r.output_ids) for r in reqs)
        return {
            "prefill_latency_s": round(first_token_t - t0, 4),
            "prefill_throughput_tok_s": round(
                args.batch_size * args.input_len / (first_token_t - t0), 1
            ),
            "total_latency_s": round(total, 4),
            "decode_throughput_tok_s": round(
                (out_tokens - args.batch_size)
                / max(total - (first_token_t - t0), 1e-9), 1
            ),
            "overall_output_tok_s": round(out_tokens / total, 1),
        }

    for _ in range(args.warmup):
        run_once()
        core.flush_cache()
    metrics = run_once()
    metrics.update(
        batch_size=args.batch_size, input_len=args.input_len,
        output_len=args.output_len,
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
