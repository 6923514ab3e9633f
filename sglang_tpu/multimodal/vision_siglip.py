"""SigLIP ViT vision tower (functional JAX) + Gemma3 projector.

Behavioral reference: srt/models/siglip.py + HF SiglipVisionModel /
Gemma3MultiModalProjector numerics. Differences vs CLIP
(multimodal/vision_clip.py): no CLS token, patch conv carries a bias,
gelu-tanh MLP act, and the post-layernorm output is what downstream
projectors consume. Shared by Gemma3-MM and DeepSeek-VL2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join


class SiglipVisionTower:
    """SigLIP ViT encoder returning post-layernorm hidden states
    [B, grid*grid, width]."""

    def __init__(self, vision_config, dtype):
        vc = vision_config
        self.width = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.width // self.heads
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.seq = self.grid * self.grid
        self.inter = vc.intermediate_size
        self.eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.dtype = dtype

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        W, I = self.width, self.inter
        s = {
            join(p, "patch_embed/weight"): ParamSpec(
                (3 * self.patch * self.patch, W), dt
            ),
            join(p, "patch_embed/bias"): ParamSpec((W,), dt),
            join(p, "pos_embed"): ParamSpec((self.seq, W), dt),
            join(p, "post_ln/weight"): ParamSpec((W,), dt),
            join(p, "post_ln/bias"): ParamSpec((W,), dt),
        }
        for i in range(self.layers):
            q = join(p, f"blocks/{i}")
            for name, shape in (
                ("ln1/weight", (W,)), ("ln1/bias", (W,)),
                ("ln2/weight", (W,)), ("ln2/bias", (W,)),
                ("q/weight", (W, W)), ("q/bias", (W,)),
                ("k/weight", (W, W)), ("k/bias", (W,)),
                ("v/weight", (W, W)), ("v/bias", (W,)),
                ("o/weight", (W, W)), ("o/bias", (W,)),
                ("fc1/weight", (W, I)), ("fc1/bias", (I,)),
                ("fc2/weight", (I, W)), ("fc2/bias", (W,)),
            ):
                s[join(q, name)] = ParamSpec(shape, dt)
        return s

    def _ln(self, params, p, x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        xn = (x - m) * jax.lax.rsqrt(v + self.eps)
        return xn * params[join(p, "weight")] + params[join(p, "bias")]

    def __call__(self, params: Params, p: str, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, S, S] -> [B, seq, width] (post-layernorm)."""
        B = pixels.shape[0]
        ps, g = self.patch, self.grid
        x = pixels.reshape(B, 3, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * ps * ps)
        x = (
            jnp.dot(x.astype(self.dtype), params[join(p, "patch_embed/weight")])
            + params[join(p, "patch_embed/bias")]
        )
        x = x + params[join(p, "pos_embed")]
        scale = self.head_dim**-0.5
        for i in range(self.layers):
            q = join(p, f"blocks/{i}")
            h = self._ln(params, join(q, "ln1"), x)

            def lin(name, t):
                return jnp.dot(t, params[join(q, name, "weight")]) + params[
                    join(q, name, "bias")
                ]

            qh = lin("q", h).reshape(B, -1, self.heads, self.head_dim)
            kh = lin("k", h).reshape(B, -1, self.heads, self.head_dim)
            vh = lin("v", h).reshape(B, -1, self.heads, self.head_dim)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * scale
            probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
            x = x + lin("o", o.reshape(B, -1, self.width))
            h = self._ln(params, join(q, "ln2"), x)
            h = jax.nn.gelu(lin("fc1", h), approximate=True)
            x = x + lin("fc2", h)
        return self._ln(params, join(p, "post_ln"), x)

    def map_hf_weight(self, hf_name: str, arr: np.ndarray, prefix: str):
        """SiglipVisionModel names (vision_model.*) -> ours."""
        n = hf_name
        if n == "embeddings.patch_embedding.weight":
            return [(join(prefix, "patch_embed/weight"), None,
                     arr.reshape(arr.shape[0], -1).T)]
        if n == "embeddings.patch_embedding.bias":
            return [(join(prefix, "patch_embed/bias"), None, arr)]
        if n == "embeddings.position_embedding.weight":
            return [(join(prefix, "pos_embed"), None, arr)]
        if n == "post_layernorm.weight":
            return [(join(prefix, "post_ln/weight"), None, arr)]
        if n == "post_layernorm.bias":
            return [(join(prefix, "post_ln/bias"), None, arr)]
        if n.startswith("encoder.layers."):
            rest = n[len("encoder.layers."):]
            idx, sub = rest.split(".", 1)
            q = join(prefix, f"blocks/{idx}")
            m = {
                "layer_norm1.weight": ("ln1/weight", ""),
                "layer_norm1.bias": ("ln1/bias", ""),
                "layer_norm2.weight": ("ln2/weight", ""),
                "layer_norm2.bias": ("ln2/bias", ""),
                "self_attn.q_proj.weight": ("q/weight", "t"),
                "self_attn.q_proj.bias": ("q/bias", ""),
                "self_attn.k_proj.weight": ("k/weight", "t"),
                "self_attn.k_proj.bias": ("k/bias", ""),
                "self_attn.v_proj.weight": ("v/weight", "t"),
                "self_attn.v_proj.bias": ("v/bias", ""),
                "self_attn.out_proj.weight": ("o/weight", "t"),
                "self_attn.out_proj.bias": ("o/bias", ""),
                "mlp.fc1.weight": ("fc1/weight", "t"),
                "mlp.fc1.bias": ("fc1/bias", ""),
                "mlp.fc2.weight": ("fc2/weight", "t"),
                "mlp.fc2.bias": ("fc2/bias", ""),
            }
            if sub in m:
                ours, tf = m[sub]
                return [(join(q, ours), None, arr.T if tf else arr)]
        return []


class Gemma3Projector:
    """HF Gemma3MultiModalProjector: avg-pool the patch grid down to
    mm_tokens_per_image, gemma-RMSNorm, then an (untransposed) matmul with
    mm_input_projection_weight [vision_W, text_H]."""

    def __init__(self, hf_config, vision: SiglipVisionTower, dtype):
        self.vw = vision.width
        self.h = hf_config.text_config.hidden_size
        tokens = int(getattr(hf_config, "mm_tokens_per_image", 256))
        self.tokens_side = int(round(tokens ** 0.5))
        self.grid = vision.grid
        self.kernel = self.grid // self.tokens_side
        self.eps = getattr(hf_config.vision_config, "layer_norm_eps", 1e-6)
        self.dtype = dtype

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        return {
            join(p, "mm_input_projection_weight"): ParamSpec(
                (self.vw, self.h), dt
            ),
            join(p, "mm_soft_emb_norm/weight"): ParamSpec((self.vw,), dt),
        }

    def __call__(self, params, p, feats):
        """feats [B, grid*grid, vw] -> [B, tokens, text_H]."""
        B = feats.shape[0]
        g, k, ts = self.grid, self.kernel, self.tokens_side
        x = feats.reshape(B, ts, k, ts, k, self.vw)
        x = x.mean(axis=(2, 4))  # [B, ts, ts, vw]
        x = x.reshape(B, ts * ts, self.vw)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + self.eps)
        xn = xn * (1.0 + params[join(p, "mm_soft_emb_norm/weight")].astype(
            jnp.float32
        ))
        return jnp.dot(
            xn.astype(feats.dtype), params[join(p, "mm_input_projection_weight")]
        )
