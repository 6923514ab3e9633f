"""CI suite registry: every test module self-describes its stage, cost,
and hardware tag.

Ref behavior: /root/reference/test/run_suite.py:387-468 +
python/sglang/test/ci/ci_register.py:23-59 — tests register into staged
suites (A preflight -> B basic -> C advanced) with an estimated runtime
used for greedy auto-partitioning across CI runners. This registry is the
TPU build's equivalent: a declarative table (no import-time side effects
in test modules) consumed by tests/run_suite.py.

Stages:
  a — preflight: fast pure-unit modules; a red A stops the pipeline.
  b — basic: the core engine path (scheduler, cache, kernels, e2e HTTP).
  c — advanced: scale-out, model-zoo breadth, aux subsystems.
  perf — TPU throughput gates (needs real hardware + SGLANG_PERF_GATE=1).

est_time is seconds on the 8-way-xdist CI box; it only needs to be
RELATIVELY right for partition balancing. Unregistered test files are
auto-assigned to stage "c" with a default estimate so new tests are never
silently dropped (run_suite warns).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Tuple


@dataclasses.dataclass(frozen=True)
class Entry:
    file: str
    stage: str  # a | b | c | perf
    est_time: float  # seconds (relative weight for partitioning)
    hw: Tuple[str, ...] = ("cpu",)  # cpu | tpu


_R: List[Entry] = []


def register(file: str, stage: str, est_time: float, hw=("cpu",)) -> None:
    _R.append(Entry(file, stage, est_time, tuple(hw)))


# ---- stage A: preflight (fast, pure-unit, no model/server boot) ----
register("test_radix_cache.py", "a", 10)
register("test_radix_cpp.py", "a", 10)
register("test_chunk_cache.py", "a", 8)
register("test_sampler.py", "a", 25)
register("test_function_call.py", "a", 20)
register("test_function_call3.py", "a", 20)
register("test_parsers.py", "a", 15)
register("test_gateway_cpp.py", "a", 10)
register("test_kv_events.py", "a", 10)
register("test_plugins_environ.py", "a", 8)
register("test_ngram_corpus.py", "a", 10)
register("test_invariants.py", "a", 10)
register("test_gguf.py", "a", 20)
register("test_priority.py", "a", 15)

# ---- stage B: the core engine path ----
register("test_schedule_core.py", "b", 90)
register("test_mixed_batch.py", "b", 60)
register("test_cascade_attn.py", "b", 60)
register("test_pallas_attention.py", "b", 90)
register("test_quant_kv.py", "b", 60)
register("test_quantization.py", "b", 240)
register("test_quant_checkpoints.py", "b", 90)
register("test_model_parity.py", "b", 120)
register("test_resident_decode.py", "b", 60)
register("test_engine.py", "b", 120)
register("test_http_server.py", "b", 180)
register("test_native_server.py", "b", 120)
register("test_grpc_server.py", "b", 120)
register("test_constrained.py", "b", 90)
register("test_mock_model.py", "b", 90)
register("test_kv_canary.py", "b", 60)
register("test_swa_pool.py", "b", 45)
register("test_tensor_parallel.py", "b", 120)
register("test_sidecar.py", "b", 60)
register("test_router.py", "b", 60)
register("test_lang_dsl.py", "b", 60)

# ---- stage C: scale-out / breadth / aux ----
register("test_alibi_models.py", "c", 90)
register("test_audio_api.py", "c", 120)
register("test_bamba.py", "c", 90)
register("test_bert_embedding.py", "c", 60)
register("test_classic_models.py", "c", 120)
register("test_dcp.py", "c", 120)
register("test_deepseek.py", "c", 180)
register("test_diffusion.py", "c", 240)
register("test_dllm.py", "c", 90)
register("test_dp_attention.py", "c", 120)
register("test_dp_controller.py", "c", 90)
register("test_dsa_sparse.py", "c", 90)
register("test_eagle.py", "c", 120)
register("test_ep_moe.py", "c", 120)
register("test_eplb.py", "c", 90)
register("test_eplb_redundant.py", "c", 90)
register("test_eval_connectors.py", "c", 45)
register("test_falcon_h1.py", "c", 90)
register("test_gateway.py", "c", 120)
register("test_gateway_mcp.py", "c", 60)
register("test_gateway_pd_e2e.py", "c", 180)
register("test_gemma2.py", "c", 90)
register("test_gemma_phi3.py", "c", 120)
register("test_gpt_oss.py", "c", 90)
register("test_granite_moe_hybrid.py", "c", 90)
register("test_hicache.py", "c", 120)
register("test_hisparse.py", "c", 90)
register("test_jamba.py", "c", 120)
register("test_linear_attn_models.py", "c", 120)
register("test_lora.py", "c", 120)
register("test_mamba.py", "c", 90)
register("test_mamba2.py", "c", 120)
register("test_mm_native.py", "c", 60)
register("test_model_zoo2.py", "c", 150)
register("test_model_zoo3.py", "c", 150)
register("test_moe_models.py", "c", 150)
register("test_moe_models2.py", "c", 150)
register("test_multimodal.py", "c", 120)
register("test_olmo2_granite.py", "c", 90)
register("test_pd_disaggregation.py", "c", 180)
register("test_pdmux.py", "c", 90)
register("test_pipeline_parallel.py", "c", 150)
register("test_qwen2_audio.py", "c", 120)
register("test_qwen3_next.py", "c", 120)
register("test_ray_mode.py", "c", 90)
register("test_score_classify.py", "c", 90)
register("test_speculative.py", "c", 120)
register("test_storage_backends.py", "c", 90)
register("test_tbo.py", "c", 90)
register("test_tree_spec.py", "c", 150)
register("test_vlm_llava.py", "c", 150)
register("test_vlm_qwen2vl.py", "c", 150)
register("test_vlm_video.py", "c", 120)
register("test_weight_cache.py", "c", 90)
register("test_weight_group.py", "c", 90)
register("test_whisper.py", "c", 120)

# ---- perf gates (real TPU only) ----
register("perf/test_perf_gate.py", "perf", 1200, hw=("tpu",))


def registry(tests_dir: str) -> Dict[str, Entry]:
    """Registered entries + auto-discovered strays (stage c)."""
    by_file = {e.file: e for e in _R}
    strays = []
    for path in sorted(glob.glob(os.path.join(tests_dir, "test_*.py"))):
        rel = os.path.basename(path)
        if rel not in by_file:
            strays.append(rel)
            by_file[rel] = Entry(rel, "c", 120.0)
    for path in sorted(
        glob.glob(os.path.join(tests_dir, "*", "test_*.py"))
    ):
        rel = os.path.relpath(path, tests_dir)
        if rel not in by_file:
            strays.append(rel)
            by_file[rel] = Entry(rel, "c", 120.0)
    by_file["__strays__"] = strays  # type: ignore[assignment]
    return by_file
