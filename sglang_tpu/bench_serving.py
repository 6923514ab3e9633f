"""Serving benchmark: async load generator + TTFT/TPOT/ITL stats.

Ref: python/sglang/benchmark/serving.py (metric definitions :999-1248) and
bench_serving.py CLI. Drives a running server's /generate streaming API
with synthetic (or random-length "sharegpt-style") prompts at a given
request rate, and reports output throughput, mean/median/p99 TTFT, TPOT,
ITL, and e2e latency.

    python -m sglang_tpu.bench_serving --base-url http://127.0.0.1:30000 \
        --num-prompts 500 --request-rate inf --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class ReqResult:
    prompt_len: int = 0
    output_len: int = 0
    ttft: float = 0.0
    latency: float = 0.0
    itls: List[float] = field(default_factory=list)
    success: bool = False


async def _one_request(session, base_url, input_ids, output_len, results):
    payload = {
        "input_ids": input_ids,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
        "stream": True,
    }
    r = ReqResult(prompt_len=len(input_ids))
    t0 = time.perf_counter()
    last = t0
    try:
        async with session.post(base_url + "/generate", json=payload) as resp:
            async for line in resp.content:
                if not line.startswith(b"data: "):
                    continue
                if line[6:].strip() == b"[DONE]":
                    break
                now = time.perf_counter()
                if r.ttft == 0.0:
                    r.ttft = now - t0
                else:
                    r.itls.append(now - last)
                last = now
                chunk = json.loads(line[6:])
                r.output_len = chunk["meta_info"]["completion_tokens"]
        r.latency = time.perf_counter() - t0
        r.success = r.output_len > 0
    except Exception as e:  # noqa: BLE001
        print(f"request failed: {e}", file=sys.stderr)
    results.append(r)


def sample_sharegpt_lengths(rng: random.Random, n: int,
                            max_input: int = 4096, max_output: int = 1024):
    """(input_len, output_len) pairs matching the ShareGPT trace shape the
    reference benchmarks sample from (benchmark/serving.py sample_requests:
    filtered 4 <= len, prompt+output <= ctx). The trace itself isn't
    shippable; its well-known marginals are approximately lognormal with
    median ~55 input / ~180 output tokens and heavy right tails — we draw
    from those, clipped the same way the reference filters."""
    pairs = []
    while len(pairs) < n:
        ilen = int(rng.lognormvariate(4.0, 1.3))  # median ~55, p95 ~470
        olen = int(rng.lognormvariate(5.2, 1.0))  # median ~180, p95 ~940
        if ilen < 4 or olen < 4:
            continue
        pairs.append((min(ilen, max_input), min(olen, max_output)))
    return pairs


async def run_benchmark(args) -> dict:
    rng = random.Random(args.seed)
    vocab = args.vocab_size
    prompts = []
    out_lens = []
    if args.dataset == "sharegpt":
        for ilen, olen in sample_sharegpt_lengths(rng, args.num_prompts):
            prompts.append([rng.randrange(2, vocab - 2) for _ in range(ilen)])
            out_lens.append(olen)
    else:
        for _ in range(args.num_prompts):
            n = args.input_len
            if args.random_range_ratio < 1.0:
                lo = int(n * args.random_range_ratio)
                n = rng.randint(max(lo, 4), args.input_len)
            prompts.append([rng.randrange(2, vocab - 2) for _ in range(n)])
            out_lens.append(args.output_len)

    results: List[ReqResult] = []
    conn = aiohttp.TCPConnector(limit=args.max_concurrency or 0)
    timeout = aiohttp.ClientTimeout(total=6 * 3600)
    t_start = time.perf_counter()
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as sess:
        tasks = []
        for ids, olen in zip(prompts, out_lens):
            tasks.append(
                asyncio.create_task(
                    _one_request(sess, args.base_url, ids, olen, results)
                )
            )
            if args.request_rate != float("inf"):
                await asyncio.sleep(rng.expovariate(args.request_rate))
        await asyncio.gather(*tasks)
    duration = time.perf_counter() - t_start

    ok = [r for r in results if r.success]
    if not ok:
        return {"error": "no successful requests"}
    total_out = sum(r.output_len for r in ok)
    total_in = sum(r.prompt_len for r in ok)
    itls = [x for r in ok for x in r.itls]
    tpots = [
        (r.latency - r.ttft) / max(r.output_len - 1, 1) for r in ok
    ]

    def stats(xs):
        return {
            "mean": float(np.mean(xs)) * 1e3,
            "median": float(np.median(xs)) * 1e3,
            "p99": float(np.percentile(xs, 99)) * 1e3,
        }

    metrics = {
        "completed": len(ok),
        "duration_s": round(duration, 2),
        "total_input_tokens": total_in,
        "total_output_tokens": total_out,
        "request_throughput": round(len(ok) / duration, 2),
        "input_throughput_tok_s": round(total_in / duration, 2),
        "output_throughput_tok_s": round(total_out / duration, 2),
        "ttft_ms": stats([r.ttft for r in ok]),
        "tpot_ms": stats(tpots),
        "itl_ms": stats(itls) if itls else None,
        "e2e_latency_ms": stats([r.latency for r in ok]),
    }
    return metrics


def main(argv=None):
    parser = argparse.ArgumentParser("sglang-tpu bench_serving")
    parser.add_argument("--base-url", type=str,
                        default="http://127.0.0.1:30000")
    parser.add_argument("--num-prompts", type=int, default=500)
    parser.add_argument("--dataset", type=str, default="random",
                        choices=["random", "sharegpt"],
                        help="sharegpt = sampled length distribution "
                             "(lognormal marginals, per-request output "
                             "lens); random = fixed/--random-range-ratio")
    parser.add_argument("--request-rate", type=lambda x: float(x), default=float("inf"))
    parser.add_argument("--max-concurrency", type=int, default=None)
    parser.add_argument("--input-len", type=int, default=512)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--random-range-ratio", type=float, default=1.0)
    parser.add_argument("--vocab-size", type=int, default=32000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-file", type=str, default=None)
    args = parser.parse_args(argv)
    metrics = asyncio.run(run_benchmark(args))
    print(json.dumps(metrics, indent=2))
    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
