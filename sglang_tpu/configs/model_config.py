"""ModelConfig: normalized view over HF config.json.

Ref: srt/configs/model_config.py. Reads the HF config (via transformers
AutoConfig from a local dir, or a plain dict) and exposes the fields the
runtime needs with GQA/head-dim defaults resolved.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "float16": jnp.bfloat16,  # TPU has no fp16 MXU path; serve fp16 ckpts as bf16
    "float32": jnp.float32,
    "auto": jnp.bfloat16,
}


@dataclasses.dataclass
class ModelConfig:
    architectures: List[str]
    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    hidden_act: str = "silu"
    attention_bias: bool = False
    context_length: int = 8192
    dtype: Any = jnp.bfloat16
    hf_config: Optional[Any] = None
    model_path: str = ""
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    # Qwen3/gemma-style extras
    qk_norm: bool = False
    logit_softcap: Optional[float] = None
    sliding_window: Optional[int] = None

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def layer_is_sliding(self, layer_id: int) -> bool:
        """Whether `layer_id` uses sliding-window attention.

        Prefers hf_config.layer_types (modern transformers); falls back to
        sliding_window_pattern (older Gemma-3 / Cohere2 configs, where every
        pattern-th layer is full attention). Raises rather than silently
        running every layer as full attention when the model declares a
        sliding window but carries neither field.
        """
        hf = self.hf_config
        # Composite VLM configs keep these on the nested text_config.
        text = getattr(hf, "text_config", None)
        if text is not None and not getattr(hf, "layer_types", None) \
                and not getattr(hf, "sliding_window_pattern", None):
            hf = text
        layer_types = list(getattr(hf, "layer_types", None) or [])
        if layer_types:
            return (
                layer_id < len(layer_types)
                and layer_types[layer_id] == "sliding_attention"
            )
        pattern = getattr(hf, "sliding_window_pattern", None)
        if pattern:
            return bool((layer_id + 1) % int(pattern))
        if self.sliding_window:
            raise ValueError(
                "config has sliding_window but neither layer_types nor "
                "sliding_window_pattern; cannot infer layer attention types"
            )
        return False

    @classmethod
    def from_hf(
        cls,
        hf_config: Any,
        dtype: str = "auto",
        context_length: Optional[int] = None,
        model_path: str = "",
    ) -> "ModelConfig":
        # VLM composite configs (LLaVA, Qwen2-VL, ...) keep the LM fields
        # under text_config; read those while hf_config stays the TOP
        # config so model classes can reach vision_config etc.
        src = hf_config
        text = getattr(hf_config, "text_config", None)
        if text is not None and getattr(
            hf_config, "num_hidden_layers", None
        ) is None:
            src = text
        if text is not None:
            # Surface text-config quirk attributes (query_pre_attn_scalar,
            # rope_local_base_freq, layer_types, ...) on the top config so
            # attention/layer classes that read hf_config.<attr> see them
            # regardless of composite nesting. Existing top-level keys win.
            for k, v in text.to_dict().items():
                if not hasattr(hf_config, k):
                    setattr(hf_config, k, v)
        g = lambda k, d=None: getattr(src, k, d)
        if getattr(src, "d_model", None) and getattr(
            src, "ffn_config", None
        ) is not None:
            # DBRX-style naming: flat fields alias via attribute_map, but
            # the MoE/attention knobs nest under attn_config/ffn_config
            # (HF configuration_dbrx.py).
            attn = getattr(src, "attn_config", None)
            ffn = src.ffn_config
            src.max_position_embeddings = getattr(src, "max_seq_len", 8192)
            if attn is not None:
                src.num_key_value_heads = getattr(attn, "kv_n_heads", None)
                src.rope_theta = getattr(attn, "rope_theta", 10000.0)
            src.intermediate_size = getattr(ffn, "ffn_hidden_size", None)
            src.moe_intermediate_size = getattr(ffn, "ffn_hidden_size", None)
            src.num_experts = getattr(ffn, "moe_num_experts", 0)
            src.num_experts_per_tok = getattr(ffn, "moe_top_k", 0)
        archs = list(getattr(hf_config, "architectures", []) or [])
        if any("Whisper" in a for a in archs):
            # Encoder-decoder ASR: the serving runtime (KV pool, attention)
            # is sized for the DECODER. WhisperConfig's attribute_map
            # aliases (num_hidden_layers etc.) point at the ENCODER and
            # __setattr__ redirects through the map, so read decoder fields
            # via a shadowing getter instead of mutating the config.
            _wh = {
                "num_hidden_layers": src.decoder_layers,
                "num_attention_heads": src.decoder_attention_heads,
                "num_key_value_heads": src.decoder_attention_heads,
                "intermediate_size": src.decoder_ffn_dim,
                "max_position_embeddings": src.max_target_positions,
                "hidden_act": "gelu",
            }
            _src = src
            g = lambda k, d=None: _wh.get(k, getattr(_src, k, d))
        # Attention-free models (Mamba/SSM) have no head fields.
        num_heads = g("num_attention_heads") or 1
        hidden = g("hidden_size")
        head_dim = g("head_dim") or hidden // num_heads
        num_kv = g("num_key_value_heads") or num_heads
        if g("qk_nope_head_dim"):
            # MLA (DeepSeek): paged pool stores decompressed per-head K/V
            # rows of qk_head_dim (V padded); every head keeps its own rows.
            head_dim = g("qk_nope_head_dim") + g("qk_rope_head_dim")
            num_kv = num_heads
        max_pos = g("max_position_embeddings", 8192)
        return cls(
            architectures=list(
                getattr(hf_config, "architectures", []) or []
            ),
            vocab_size=g("vocab_size"),
            hidden_size=hidden,
            num_hidden_layers=g("num_hidden_layers"),
            num_attention_heads=num_heads,
            num_key_value_heads=num_kv,
            head_dim=head_dim,
            intermediate_size=g("intermediate_size"),
            rms_norm_eps=g("rms_norm_eps", 1e-6),
            rope_theta=g("rope_theta", 10000.0),
            rope_scaling=g("rope_scaling", None),
            max_position_embeddings=max_pos,
            tie_word_embeddings=g("tie_word_embeddings", False),
            hidden_act=g("hidden_act", "silu"),
            attention_bias=bool(g("attention_bias", False) or g("qkv_bias", False)),
            context_length=context_length or max_pos,
            dtype=DTYPE_MAP[dtype],
            hf_config=hf_config,
            model_path=model_path,
            num_experts=g("num_local_experts", 0) or g("num_experts", 0)
            or g("n_routed_experts", 0) or 0,
            num_experts_per_tok=g("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=g("moe_intermediate_size", 0) or 0,
            sliding_window=g("sliding_window", None),
        )

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        dtype: str = "auto",
        context_length: Optional[int] = None,
        trust_remote_code: bool = False,
        model_override_args: Optional[str] = None,
    ) -> "ModelConfig":
        from transformers import AutoConfig

        from sglang_tpu.quantization.gguf import config_from_gguf, find_gguf_file

        gguf_path = find_gguf_file(model_path)
        has_config_json = os.path.isdir(model_path) and os.path.exists(
            os.path.join(model_path, "config.json")
        )
        if gguf_path and not has_config_json:
            # Bare .gguf: synthesize the HF config from GGUF metadata
            # (ref srt/model_loader GGUF path / hf config_from_gguf).
            from transformers import LlamaConfig

            hf_config = LlamaConfig(**{
                k: v for k, v in config_from_gguf(gguf_path).items()
                if k not in ("architectures", "model_type")
            })
            hf_config.architectures = ["LlamaForCausalLM"]
        else:
            try:
                hf_config = AutoConfig.from_pretrained(
                    model_path, trust_remote_code=trust_remote_code
                )
            except (ValueError, KeyError):
                # model_type unknown to this transformers version (grok,
                # kimi-linear, ...): read config.json into a generic
                # PretrainedConfig — the registry keys on architectures[0].
                from transformers import PretrainedConfig

                hf_config = PretrainedConfig.from_json_file(
                    os.path.join(model_path, "config.json")
                )
        if model_override_args:
            for k, v in json.loads(model_override_args).items():
                setattr(hf_config, k, v)
        return cls.from_hf(
            hf_config, dtype=dtype, context_length=context_length,
            model_path=model_path,
        )
