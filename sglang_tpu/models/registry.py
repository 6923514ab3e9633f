"""Model registry: HF `architectures[0]` -> model class.

Ref: srt/models/* each exporting EntryClass; srt/models/registry.py. Ours
is an explicit table (import-cheap, no dir scan needed yet).
"""

from __future__ import annotations

import importlib
from typing import Dict, Tuple

# architecture name -> (module, class)
_MODEL_TABLE: Dict[str, Tuple[str, str]] = {
    "LlamaForCausalLM": ("sglang_tpu.models.llama", "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("sglang_tpu.models.llama", "Qwen2ForCausalLM"),
    "Qwen3ForCausalLM": ("sglang_tpu.models.llama", "Qwen3ForCausalLM"),
    "MistralForCausalLM": ("sglang_tpu.models.llama", "LlamaForCausalLM"),
    "Llama4ForCausalLM": ("sglang_tpu.models.llama4", "Llama4ForCausalLM"),
    "Grok1ForCausalLM": ("sglang_tpu.models.grok", "Grok1ForCausalLM"),
    "Grok1ModelForCausalLM": ("sglang_tpu.models.grok", "Grok1ForCausalLM"),
    "Qwen2MoeForCausalLM": ("sglang_tpu.models.qwen2_moe", "Qwen2MoeForCausalLM"),
    "Qwen3MoeForCausalLM": ("sglang_tpu.models.qwen2_moe", "Qwen3MoeForCausalLM"),
    "MixtralForCausalLM": ("sglang_tpu.models.mixtral", "MixtralForCausalLM"),
    "Gemma2ForCausalLM": ("sglang_tpu.models.gemma2", "Gemma2ForCausalLM"),
    "GemmaForCausalLM": ("sglang_tpu.models.gemma", "GemmaForCausalLM"),
    "Gemma3ForCausalLM": ("sglang_tpu.models.gemma3", "Gemma3ForCausalLM"),
    "Phi3ForCausalLM": ("sglang_tpu.models.phi3", "Phi3ForCausalLM"),
    "Olmo2ForCausalLM": ("sglang_tpu.models.olmo2", "Olmo2ForCausalLM"),
    "OlmoForCausalLM": ("sglang_tpu.models.olmo", "OlmoForCausalLM"),
    "GptOssForCausalLM": ("sglang_tpu.models.gpt_oss", "GptOssForCausalLM"),
    "Starcoder2ForCausalLM": ("sglang_tpu.models.starcoder2",
                              "Starcoder2ForCausalLM"),
    "Cohere2ForCausalLM": ("sglang_tpu.models.cohere2", "Cohere2ForCausalLM"),
    "StableLmForCausalLM": ("sglang_tpu.models.stablelm", "StableLmForCausalLM"),
    "GraniteForCausalLM": ("sglang_tpu.models.granite", "GraniteForCausalLM"),
    "DeepseekV2ForCausalLM": ("sglang_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    "DeepseekV3ForCausalLM": ("sglang_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    # V3.2 (DSA sparse attention; enabled by index_topk on the config)
    "DeepseekV32ForCausalLM": ("sglang_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    "GlmForCausalLM": ("sglang_tpu.models.glm", "GlmForCausalLM"),
    "Glm4ForCausalLM": ("sglang_tpu.models.glm", "Glm4ForCausalLM"),
    "Exaone4ForCausalLM": ("sglang_tpu.models.exaone4", "Exaone4ForCausalLM"),
    "SmolLM3ForCausalLM": ("sglang_tpu.models.smollm3", "SmolLM3ForCausalLM"),
    "ArceeForCausalLM": ("sglang_tpu.models.arcee", "ArceeForCausalLM"),
    "Ernie4_5ForCausalLM": ("sglang_tpu.models.ernie4_5", "Ernie45ForCausalLM"),
    "Ernie4_5_MoeForCausalLM": ("sglang_tpu.models.ernie4_5_moe",
                                "Ernie45MoeForCausalLM"),
    "Dots1ForCausalLM": ("sglang_tpu.models.dots1", "Dots1ForCausalLM"),
    "HunYuanDenseV1ForCausalLM": ("sglang_tpu.models.hunyuan",
                                  "HunYuanDenseV1ForCausalLM"),
    "HunYuanMoEV1ForCausalLM": ("sglang_tpu.models.hunyuan",
                                "HunYuanMoEV1ForCausalLM"),
    "NemotronForCausalLM": ("sglang_tpu.models.nemotron", "NemotronForCausalLM"),
    "PhiForCausalLM": ("sglang_tpu.models.phi", "PhiForCausalLM"),
    "GPT2LMHeadModel": ("sglang_tpu.models.gpt2", "GPT2LMHeadModel"),
    "GPTNeoXForCausalLM": ("sglang_tpu.models.gpt_neox", "GPTNeoXForCausalLM"),
    "BertModel": ("sglang_tpu.models.bert", "BertModel"),
    "MambaForCausalLM": ("sglang_tpu.models.mamba", "MambaForCausalLM"),
    "FalconMambaForCausalLM": ("sglang_tpu.models.mamba",
                               "MambaForCausalLM"),
    "Mamba2ForCausalLM": ("sglang_tpu.models.mamba2",
                          "Mamba2ForCausalLM"),
    "BambaForCausalLM": ("sglang_tpu.models.bamba", "BambaForCausalLM"),
    "FalconH1ForCausalLM": ("sglang_tpu.models.falcon_h1",
                            "FalconH1ForCausalLM"),
    "GraniteMoeHybridForCausalLM": ("sglang_tpu.models.granite_moe_hybrid",
                                    "GraniteMoeHybridForCausalLM"),
    "Lfm2ForCausalLM": ("sglang_tpu.models.lfm2", "Lfm2ForCausalLM"),
    "BloomForCausalLM": ("sglang_tpu.models.bloom", "BloomForCausalLM"),
    "MptForCausalLM": ("sglang_tpu.models.mpt", "MptForCausalLM"),
    "OPTForCausalLM": ("sglang_tpu.models.opt", "OPTForCausalLM"),
    "PersimmonForCausalLM": ("sglang_tpu.models.persimmon",
                             "PersimmonForCausalLM"),
    "GPTBigCodeForCausalLM": ("sglang_tpu.models.gpt_bigcode",
                              "GPTBigCodeForCausalLM"),
    "FalconForCausalLM": ("sglang_tpu.models.falcon", "FalconForCausalLM"),
    "RWForCausalLM": ("sglang_tpu.models.falcon", "FalconForCausalLM"),
    "CohereForCausalLM": ("sglang_tpu.models.cohere", "CohereForCausalLM"),
    "Olmo3ForCausalLM": ("sglang_tpu.models.olmo3", "Olmo3ForCausalLM"),
    "FlexOlmoForCausalLM": ("sglang_tpu.models.flex_olmo",
                            "FlexOlmoForCausalLM"),
    "ApertusForCausalLM": ("sglang_tpu.models.apertus",
                           "ApertusForCausalLM"),
    "SeedOssForCausalLM": ("sglang_tpu.models.llama", "LlamaForCausalLM"),
    "WhisperForConditionalGeneration": ("sglang_tpu.models.whisper",
                                        "WhisperForConditionalGeneration"),
    "MiniMaxForCausalLM": ("sglang_tpu.models.minimax",
                           "MiniMaxForCausalLM"),
    "MiniMaxText01ForCausalLM": ("sglang_tpu.models.minimax",
                                 "MiniMaxForCausalLM"),
    "JambaForCausalLM": ("sglang_tpu.models.jamba", "JambaForCausalLM"),
    "Qwen3NextForCausalLM": ("sglang_tpu.models.qwen3_next",
                             "Qwen3NextForCausalLM"),
    "OlmoeForCausalLM": ("sglang_tpu.models.olmoe", "OlmoeForCausalLM"),
    "DbrxForCausalLM": ("sglang_tpu.models.dbrx", "DbrxForCausalLM"),
    "Glm4MoeForCausalLM": ("sglang_tpu.models.glm4_moe", "Glm4MoeForCausalLM"),
    # GLM-4.6/4.5V text stack reuses the same arch
    "Glm4vMoeForCausalLM": ("sglang_tpu.models.glm4_moe", "Glm4MoeForCausalLM"),
    "GraniteMoeForCausalLM": ("sglang_tpu.models.granite_moe",
                              "GraniteMoeForCausalLM"),
    "GraniteMoeSharedForCausalLM": ("sglang_tpu.models.granite_moe_shared",
                                    "GraniteMoeSharedForCausalLM"),
    "PhimoeForCausalLM": ("sglang_tpu.models.phimoe", "PhimoeForCausalLM"),
    "LlamaForSequenceClassification": (
        "sglang_tpu.models.llama_classification",
        "LlamaForSequenceClassification",
    ),
    "BertForMaskedLM": ("sglang_tpu.models.bert", "BertModel"),
    "LlavaForConditionalGeneration": ("sglang_tpu.models.llava",
                                      "LlavaForConditionalGeneration"),
    "Qwen2VLForConditionalGeneration": ("sglang_tpu.models.qwen2_vl",
                                        "Qwen2VLForConditionalGeneration"),
    "Gemma3ForConditionalGeneration": ("sglang_tpu.models.gemma3_mm",
                                       "Gemma3ForConditionalGeneration"),
    "InternVLForConditionalGeneration": ("sglang_tpu.models.internvl",
                                         "InternVLForConditionalGeneration"),
    "InternVLChatModel": ("sglang_tpu.models.internvl",
                          "InternVLForConditionalGeneration"),
    "Qwen2AudioForConditionalGeneration": ("sglang_tpu.models.qwen2_audio",
                                           "Qwen2AudioForConditionalGeneration"),
}


# Directly-registered classes (plugins): consulted before the table.
_DIRECT_CLASSES: Dict[str, type] = {}


def get_model_class(architectures):
    for arch in architectures:
        if arch in _DIRECT_CLASSES:
            return _DIRECT_CLASSES[arch]
        if arch in _MODEL_TABLE:
            module, cls = _MODEL_TABLE[arch]
            return getattr(importlib.import_module(module), cls)
    raise ValueError(f"no model implementation for architectures={architectures}")


def register_model(arch: str, module: str, cls: str) -> None:
    _MODEL_TABLE[arch] = (module, cls)


def register_model_class(arch: str, cls: type) -> None:
    """Plugin surface: register an architecture by class object."""
    _DIRECT_CLASSES[arch] = cls
