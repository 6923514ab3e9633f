"""Phase-split profiler: runs the bench workload (8b or 1b config) and
attributes wall time to prefill vs decode steps, with optional
jax.profiler trace capture of a window of steps.

Usage:
  python tools/profile_phases.py 8b            # phase split
  TRACE=prefill python tools/profile_phases.py 8b   # + profiler trace
  N_REQS=32 OUT_LEN=32 python tools/profile_phases.py 8b  # smaller probe
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CONFIGS  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.core.req import Req
    from sglang_tpu.core.schedule_core import ScheduleCore
    from sglang_tpu.model_exec.forward_batch import ForwardMode
    from sglang_tpu.model_exec.model_runner import ModelRunner
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    name = sys.argv[1] if len(sys.argv) > 1 else "8b"
    cfg = dict(CONFIGS[name])
    n_reqs = int(os.environ.get("N_REQS", cfg["n_reqs"]))
    out_len = int(os.environ.get("OUT_LEN", "128"))
    prompt_len = int(os.environ.get("PROMPT_LEN", "512"))

    config = ModelConfig(
        architectures=["LlamaForCausalLM"],
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg["num_key_value_heads"],
        head_dim=cfg["head_dim"],
        intermediate_size=cfg["intermediate_size"],
        context_length=4096, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    args = ServerArgs(
        model_path=f"__profile_{name}__", load_format="dummy",
        page_size=int(os.environ.get("BENCH_PAGE_SIZE", "64")),
        max_running_requests=n_reqs,
        max_total_tokens=cfg["max_total_tokens"],
        chunked_prefill_size=int(os.environ.get("CHUNK", "8192")),
        random_seed=0,
        quantization=cfg["quantization"],
        kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", cfg["kv_dtype"]),
    )
    runner = ModelRunner(args, model_config=config)
    core = ScheduleCore(args, runner)
    rng = np.random.default_rng(0)
    shared_prefix = rng.integers(2, 60000, size=128).tolist()

    def make_reqs(tag):
        out = []
        for i in range(n_reqs):
            prompt = shared_prefix + rng.integers(
                2, 60000, size=prompt_len - 128).tolist()
            sp = SamplingParams(temperature=0.0, max_new_tokens=out_len,
                                ignore_eos=True)
            sp.normalize()
            out.append(Req(f"{tag}-{i}", prompt, sp))
        return out

    # Instrument _schedule_and_launch to tag each step's mode.
    events = []
    orig_launch = core._schedule_and_launch

    def traced_launch():
        t0 = time.perf_counter()
        before = len(core.pending)
        launched = orig_launch()
        mode = None
        ntok = 0
        if launched and len(core.pending) > before:
            pb = core.pending[-1]
            mode = pb.mode.name
            ntok = sum(
                1 if pb.mode == ForwardMode.DECODE
                else len(si.new_token_ids) if si is not None else 1
                for si in ([None] * len(pb.rows))
            )
            ntok = len(pb.rows)
        events.append((t0, time.perf_counter(), mode, ntok))
        return launched

    print("warmup...", flush=True)
    t0 = time.perf_counter()
    for r in make_reqs("warm"):
        core.add_request(r)
    while core.has_work():
        core.step()
    core.flush_cache()
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

    core._schedule_and_launch = traced_launch
    trace_mode = os.environ.get("TRACE")
    reqs = make_reqs("bench")
    t0 = time.perf_counter()
    for r in reqs:
        core.add_request(r)
    tracing = False
    step_i = 0
    while core.has_work():
        if trace_mode == "prefill" and step_i == 1 and not tracing:
            jax.profiler.start_trace("/tmp/jax_trace_prefill")
            tracing = True
        if trace_mode == "decode" and step_i == 40 and not tracing:
            jax.profiler.start_trace("/tmp/jax_trace_decode")
            tracing = True
        core.step()
        step_i += 1
        if tracing and (
            (trace_mode == "prefill" and step_i == 4)
            or (trace_mode == "decode" and step_i == 46)
        ):
            # Block so the trace captures full device execution.
            np.asarray(runner.next_tokens_buf)
            jax.profiler.stop_trace()
            tracing = False
            print("trace saved", flush=True)
    elapsed = time.perf_counter() - t0
    total_out = sum(len(r.output_ids) for r in reqs)

    # Aggregate: a step's wall is (end - start of next event window); use
    # per-event durations directly (host wall between launches).
    by_mode = {}
    # Attribute inter-step gaps: wall time from event i start to event i+1
    # start belongs to event i's mode (the launch + its result processing).
    for i, (s, e, mode, ntok) in enumerate(events):
        nxt = events[i + 1][0] if i + 1 < len(events) else e
        dur = nxt - s
        key = mode or "idle"
        agg = by_mode.setdefault(key, [0.0, 0, 0])
        agg[0] += dur
        agg[1] += 1
        agg[2] += ntok
    print(json.dumps({
        "config": name, "n_reqs": n_reqs, "out_len": out_len,
        "elapsed_s": round(elapsed, 2),
        "tok_s": round(total_out / elapsed, 1),
        "phases": {
            k: {"wall_s": round(v[0], 2), "steps": v[1], "rows": v[2]}
            for k, v in by_mode.items()
        },
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
