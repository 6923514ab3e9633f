"""Probe: is the 8B-config step viable on this chip? Small instrumented
run — one prefill chunk + a few decode steps, timed."""
import os, time
import numpy as np

os.environ.setdefault("BENCH_KV_DTYPE", "fp8_e5m2")

import jax.numpy as jnp
from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.core.req import Req
from sglang_tpu.core.schedule_core import ScheduleCore
from sglang_tpu.model_exec.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs

config = ModelConfig(
    architectures=["LlamaForCausalLM"], vocab_size=128256,
    hidden_size=4096, num_hidden_layers=32, num_attention_heads=32,
    num_key_value_heads=8, head_dim=128, intermediate_size=14336,
    context_length=4096, rope_theta=500000.0, dtype=jnp.bfloat16,
)
args = ServerArgs(
    model_path="__probe8b__", load_format="dummy", page_size=64,
    max_running_requests=32, max_total_tokens=32768,
    chunked_prefill_size=2048, random_seed=0,
    quantization=os.environ.get("PROBE_QUANT", "int8"),
    kv_cache_dtype=os.environ.get("BENCH_KV_DTYPE", "fp8_e5m2"),
)
t0 = time.perf_counter()
runner = ModelRunner(args, model_config=config)
print(f"runner init {time.perf_counter()-t0:.1f}s", flush=True)
core = ScheduleCore(args, runner)
rng = np.random.default_rng(0)
reqs = []
for i in range(8):
    prompt = rng.integers(2, 60000, size=512).tolist()
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    sp.normalize()
    r = Req(f"p{i}", prompt, sp)
    reqs.append(r)
    core.add_request(r)
steps = 0
t0 = time.perf_counter()
while core.has_work():
    core.step()
    steps += 1
    print(f"step {steps} t={time.perf_counter()-t0:.1f}s", flush=True)
    if steps > 60:
        break
total = sum(len(r.output_ids) for r in reqs)
print(f"done: {total} tokens in {time.perf_counter()-t0:.1f}s", flush=True)
