"""Qwen2-VL: ViT with 2D rope + Qwen2 LM with 3-D M-ROPE.

Behavioral reference: srt/models/qwen2_vl.py + HF
Qwen2VLForConditionalGeneration numerics. Vision features are injected at
image-placeholder positions through the LM's input_embeds path; language
positions are 3-D (t/h/w) mrope computed at admission
(compute_mrope_positions, the HF get_rope_index analog) and carried by
the ForwardBatch (mrope_positions for extend, mrope_delta for decode).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.rotary import MRotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
)
from sglang_tpu.multimodal.vision_qwen2vl import Qwen2VLVisionTower


def compute_mrope_positions(
    input_ids: List[int],
    image_token_id,  # int or set of placeholder ids (image + video)
    grids,  # list of (t, h, w) or ((t, h, w), retention_mask)
    merge: int,
) -> Tuple[np.ndarray, int]:
    """HF Qwen2VLModel.get_rope_index behavior for images AND videos:
    text tokens get sequential (equal t/h/w) positions; each mm block
    gets a (t, h, w) grid starting at the current max+1 (videos advance
    the t component per temporal group); text after a block continues
    from max+1. EVS-pruned videos keep each retained token's ORIGINAL
    grid coordinates (the mask selects rows of the full grid).
    Returns ([3, L] positions, decode delta)."""
    mm_tokens = (
        {image_token_id} if isinstance(image_token_id, int)
        else set(image_token_id)
    )
    L = len(input_ids)
    pos = np.zeros((3, L), np.int64)
    i = 0
    cur = 0  # next position value
    img_i = 0
    while i < L:
        if input_ids[i] in mm_tokens and img_i < len(grids):
            entry = grids[img_i]
            mask = None
            if (isinstance(entry, tuple) and len(entry) == 2
                    and not isinstance(entry[1], int)):
                (t, h, w), mask = entry
            else:
                t, h, w = entry
            img_i += 1
            hh, ww = h // merge, w // merge
            tt = np.repeat(np.arange(t), hh * ww)
            hp = np.tile(np.repeat(np.arange(hh), ww), t)
            wp = np.tile(np.arange(ww), t * hh)
            if mask is not None:
                tt, hp, wp = tt[mask], hp[mask], wp[mask]
            n = tt.shape[0]
            pos[0, i : i + n] = cur + tt
            pos[1, i : i + n] = cur + hp
            pos[2, i : i + n] = cur + wp
            cur = pos[:, i : i + n].max() + 1
            i += n
        else:
            pos[:, i] = cur
            cur += 1
            i += 1
    delta = int(cur - L)
    return pos.astype(np.int32), delta


class Qwen2VLAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.rotary = MRotaryEmbedding(
            self.hd, None, config.context_length, config.rope_theta,
            config.rope_scaling,
        )

    def apply_rotary(self, fb: ForwardBatch, q, k):
        if fb.mrope_positions is not None:
            return self.rotary.call_mrope(fb.mrope_positions, q, k)
        pos = fb.positions
        if fb.mrope_delta is not None:
            # decode: all mrope components coincide at pos + delta
            delta = fb.mrope_delta
            if pos.shape[0] != delta.shape[0]:
                delta = delta[fb.seq_ids]
            pos = pos + delta
        return self.rotary(pos, q, k)


class Qwen2VLDecoderLayer(LlamaDecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.attn = Qwen2VLAttention(config, layer_id)


class Qwen2VLForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True
    needs_mrope = True

    def __init__(self, config: ModelConfig):
        # Qwen2 LM: attention bias on qkv
        config.attention_bias = True
        super().__init__(config)
        self.decoder_layers = [
            Qwen2VLDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]
        hf = config.hf_config
        self.image_token_id = getattr(
            hf, "image_token_id", getattr(hf, "image_token_index", None)
        )
        self.video_token_id = getattr(hf, "video_token_id", None)
        self.vision = Qwen2VLVisionTower(hf.vision_config, config.dtype)
        self.mm_merge = self.vision.merge

    def param_specs(self):
        s = super().param_specs()
        s.update(self.vision.specs("vision"))
        return s

    def encode_images(self, params, pixel_values: jax.Array,
                      grid_thw=None) -> jax.Array:
        """pixel_values [N, 3*tps*ps*ps] (one image/video); grid_thw
        (t, h, w) -> [N/merge^2, H]. Videos (t > 1) attend
        block-diagonally per frame (HF cu_seqlens semantics)."""
        rot = jnp.asarray(self.vision.rot_tables(grid_thw))
        t, h, w = grid_thw
        frame_len = h * w if t > 1 else 0
        return self.vision(params, "vision", pixel_values, rot,
                           frame_len=frame_len)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        for pre in ("model.visual.", "visual."):
            if name.startswith(pre):
                return self.vision.map_hf_weight(name[len(pre):], arr,
                                                 "vision")
        if name.startswith("model.language_model."):
            return super().map_hf_weight(
                "model." + name[len("model.language_model."):], arr
            )
        return super().map_hf_weight(name, arr)
