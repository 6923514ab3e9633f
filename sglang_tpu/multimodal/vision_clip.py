"""CLIP ViT vision tower (functional JAX) + LLaVA projector.

Behavioral reference: srt/models/llava.py + HF CLIPVisionModel /
LlavaMultiModalProjector numerics. Runs under jit on TPU: the patch conv
is a matmul over flattened patches (MXU-friendly), attention is dense
(every image is a fixed 577-token sequence — no paging needed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACT = {"quick_gelu": _quick_gelu, "gelu": jax.nn.gelu,
        "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True)}


class CLIPVisionTower:
    """CLIP ViT encoder, returning the hidden states of a chosen layer.

    Weight layout: all linear weights stored [in, out] (HF transposed at
    load); the patch conv [3, ps, ps, width] flattened to a matmul.
    """

    def __init__(self, vision_config, dtype, feature_layer: int = -2):
        vc = vision_config
        self.width = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.width // self.heads
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.seq = self.grid * self.grid + 1  # + CLS
        self.inter = vc.intermediate_size
        self.eps = vc.layer_norm_eps
        self.act = _ACT[getattr(vc, "hidden_act", "quick_gelu")]
        self.dtype = dtype
        # hidden_states index -2 == output of layer (layers-1) pre final ln
        self.n_run = self.layers + (feature_layer + 1 if feature_layer < 0
                                    else feature_layer - self.layers + 1)

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        W, I = self.width, self.inter
        s = {
            join(p, "patch_embed/weight"): ParamSpec(
                (3 * self.patch * self.patch, W), dt
            ),
            join(p, "class_embedding"): ParamSpec((W,), dt),
            join(p, "pos_embed"): ParamSpec((self.seq, W), dt),
            join(p, "pre_ln/weight"): ParamSpec((W,), dt),
            join(p, "pre_ln/bias"): ParamSpec((W,), dt),
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
        """pixels [B, 3, S, S] -> features [B, seq, width] (pre-final-ln
        hidden states of the selected layer)."""
        B = pixels.shape[0]
        ps, g = self.patch, self.grid
        # conv2d stride=ps == matmul over flattened patches
        x = pixels.reshape(B, 3, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * ps * ps)
        x = jnp.dot(x.astype(self.dtype), params[join(p, "patch_embed/weight")])
        cls = jnp.broadcast_to(
            params[join(p, "class_embedding")][None, None], (B, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1) + params[join(p, "pos_embed")]
        x = self._ln(params, join(p, "pre_ln"), x)
        scale = self.head_dim**-0.5
        for i in range(self.n_run):
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
            h = self.act(lin("fc1", h))
            x = x + lin("fc2", h)
        return x

    def map_hf_weight(self, hf_name: str, arr: np.ndarray, prefix: str):
        """CLIPVisionModel names (vision_tower.vision_model.*) -> ours."""
        n = hf_name
        out = []
        if n == "embeddings.class_embedding":
            return [(join(prefix, "class_embedding"), None, arr)]
        if n == "embeddings.position_embedding.weight":
            return [(join(prefix, "pos_embed"), None, arr)]
        if n == "embeddings.patch_embedding.weight":
            # [W, 3, ps, ps] -> [3*ps*ps, W]
            return [(join(prefix, "patch_embed/weight"), None,
                     arr.reshape(arr.shape[0], -1).T)]
        if n == "pre_layrnorm.weight":
            return [(join(prefix, "pre_ln/weight"), None, arr)]
        if n == "pre_layrnorm.bias":
            return [(join(prefix, "pre_ln/bias"), None, arr)]
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
        return out


class LlavaProjector:
    """2-layer MLP projector (HF LlavaMultiModalProjector)."""

    def __init__(self, vision_width: int, hidden: int, dtype, act="gelu"):
        self.vw, self.h, self.dtype = vision_width, hidden, dtype
        self.act = _ACT.get(act, jax.nn.gelu)

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        return {
            join(p, "linear_1/weight"): ParamSpec((self.vw, self.h), dt),
            join(p, "linear_1/bias"): ParamSpec((self.h,), dt),
            join(p, "linear_2/weight"): ParamSpec((self.h, self.h), dt),
            join(p, "linear_2/bias"): ParamSpec((self.h,), dt),
        }

    def __call__(self, params, p, x):
        x = jnp.dot(x, params[join(p, "linear_1/weight")]) + params[
            join(p, "linear_1/bias")
        ]
        x = self.act(x)
        return jnp.dot(x, params[join(p, "linear_2/weight")]) + params[
            join(p, "linear_2/bias")
        ]
