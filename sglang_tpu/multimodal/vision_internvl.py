"""InternVL vision tower (InternViT, functional JAX) + projector.

Behavioral reference: srt/models/internvl.py + HF InternVLVisionModel /
InternVLMultiModalProjector numerics. BEiT-style blocks: CLS token +
absolute position embeddings, pre/post norms (layer_norm or rms_norm per
config.norm_type), per-layer lambda_1/lambda_2 layer scales, optional
full-width qk RMSNorm, and a pixel-shuffle (space-to-depth) downsample
before the LN+MLP projector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join

_ACT = {"gelu": jax.nn.gelu,
        "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True)}


class InternVLVisionTower:
    def __init__(self, vision_config, dtype):
        vc = vision_config
        self.width = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.width // self.heads
        self.patch = vc.patch_size if isinstance(vc.patch_size, int) \
            else vc.patch_size[0]
        img = vc.image_size if isinstance(vc.image_size, int) \
            else vc.image_size[0]
        self.grid = img // self.patch
        self.seq = self.grid * self.grid + 1  # + CLS
        self.inter = vc.intermediate_size
        self.eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.rms_blocks = getattr(vc, "norm_type", "layer_norm") == "rms_norm"
        self.qk_norm = bool(getattr(vc, "use_qk_norm", False))
        self.abs_pos = bool(
            getattr(vc, "use_absolute_position_embeddings", True)
        )
        self.final_ln = not bool(getattr(vc, "use_mean_pooling", True))
        self.attn_bias = bool(getattr(vc, "attention_bias", True))
        self.act = _ACT.get(getattr(vc, "hidden_act", "gelu"), jax.nn.gelu)
        self.dtype = dtype

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        W, I = self.width, self.inter
        s = {
            join(p, "patch_embed/weight"): ParamSpec(
                (3 * self.patch * self.patch, W), dt
            ),
            join(p, "patch_embed/bias"): ParamSpec((W,), dt),
            join(p, "cls_token"): ParamSpec((W,), dt),
        }
        if self.abs_pos:
            s[join(p, "pos_embed")] = ParamSpec((self.seq, W), dt)
        if self.final_ln:
            s[join(p, "final_ln/weight")] = ParamSpec((W,), dt)
            s[join(p, "final_ln/bias")] = ParamSpec((W,), dt)
        for i in range(self.layers):
            q = join(p, f"blocks/{i}")
            names = [
                ("ln1/weight", (W,)), ("ln2/weight", (W,)),
                ("q/weight", (W, W)), ("k/weight", (W, W)),
                ("v/weight", (W, W)),
                ("o/weight", (W, W)), ("o/bias", (W,)),
                ("fc1/weight", (W, I)), ("fc1/bias", (I,)),
                ("fc2/weight", (I, W)), ("fc2/bias", (W,)),
                ("lambda_1", (W,)), ("lambda_2", (W,)),
            ]
            if not self.rms_blocks:
                names += [("ln1/bias", (W,)), ("ln2/bias", (W,))]
            if self.attn_bias:
                names += [("q/bias", (W,)), ("k/bias", (W,)),
                          ("v/bias", (W,))]
            if self.qk_norm:
                names += [("q_norm/weight", (W,)), ("k_norm/weight", (W,))]
            for name, shape in names:
                s[join(q, name)] = ParamSpec(shape, dt)
        return s

    def _norm(self, params, p, x, rms=None):
        rms = self.rms_blocks if rms is None else rms
        xf = x.astype(jnp.float32)
        if rms:
            v = jnp.mean(xf * xf, axis=-1, keepdims=True)
            xn = xf * jax.lax.rsqrt(v + self.eps)
            return (xn * params[join(p, "weight")].astype(jnp.float32)
                    ).astype(x.dtype)
        m = jnp.mean(xf, axis=-1, keepdims=True)
        v = jnp.var(xf, axis=-1, keepdims=True)
        xn = (xf - m) * jax.lax.rsqrt(v + self.eps)
        return (xn * params[join(p, "weight")] + params[join(p, "bias")]
                ).astype(x.dtype)

    def __call__(self, params: Params, p: str, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, S, S] -> [B, 1+g*g, width] (CLS first)."""
        B = pixels.shape[0]
        ps, g = self.patch, self.grid
        x = pixels.reshape(B, 3, g, ps, g, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * ps * ps)
        x = (jnp.dot(x.astype(self.dtype),
                     params[join(p, "patch_embed/weight")])
             + params[join(p, "patch_embed/bias")])
        cls = jnp.broadcast_to(
            params[join(p, "cls_token")][None, None], (B, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        if self.abs_pos:
            x = x + params[join(p, "pos_embed")]
        scale = self.head_dim**-0.5
        for i in range(self.layers):
            q = join(p, f"blocks/{i}")

            def lin(name, t):
                y = jnp.dot(t, params[join(q, name, "weight")])
                b = params.get(join(q, name, "bias"))
                return y + b if b is not None else y

            h = self._norm(params, join(q, "ln1"), x)
            qh, kh, vh = lin("q", h), lin("k", h), lin("v", h)
            if self.qk_norm:
                qh = self._norm(params, join(q, "q_norm"), qh, rms=True)
                kh = self._norm(params, join(q, "k_norm"), kh, rms=True)
            qh = qh.reshape(B, -1, self.heads, self.head_dim)
            kh = kh.reshape(B, -1, self.heads, self.head_dim)
            vh = vh.reshape(B, -1, self.heads, self.head_dim)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * scale
            probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
            a = lin("o", o.reshape(B, -1, self.width))
            x = x + a * params[join(q, "lambda_1")]
            h = self._norm(params, join(q, "ln2"), x)
            h = self.act(lin("fc1", h))
            h = lin("fc2", h)
            x = x + h * params[join(q, "lambda_2")]
        if self.final_ln:
            x = self._norm(params, join(p, "final_ln"), x, rms=False)
        return x

    def map_hf_weight(self, n: str, arr: np.ndarray, prefix: str):
        if n == "embeddings.cls_token":
            return [(join(prefix, "cls_token"), None, arr.reshape(-1))]
        if n == "embeddings.position_embeddings":
            return [(join(prefix, "pos_embed"), None,
                     arr.reshape(arr.shape[-2], arr.shape[-1]))]
        if n == "embeddings.patch_embeddings.projection.weight":
            return [(join(prefix, "patch_embed/weight"), None,
                     arr.reshape(arr.shape[0], -1).T)]
        if n == "embeddings.patch_embeddings.projection.bias":
            return [(join(prefix, "patch_embed/bias"), None, arr)]
        if n == "layernorm.weight":
            return [(join(prefix, "final_ln/weight"), None, arr)]
        if n == "layernorm.bias":
            return [(join(prefix, "final_ln/bias"), None, arr)]
        if n.startswith("encoder.layer."):
            rest = n[len("encoder.layer."):]
            idx, sub = rest.split(".", 1)
            q = join(prefix, f"blocks/{idx}")
            m = {
                "layernorm_before.weight": ("ln1/weight", ""),
                "layernorm_before.bias": ("ln1/bias", ""),
                "layernorm_after.weight": ("ln2/weight", ""),
                "layernorm_after.bias": ("ln2/bias", ""),
                "attention.q_proj.weight": ("q/weight", "t"),
                "attention.q_proj.bias": ("q/bias", ""),
                "attention.k_proj.weight": ("k/weight", "t"),
                "attention.k_proj.bias": ("k/bias", ""),
                "attention.v_proj.weight": ("v/weight", "t"),
                "attention.v_proj.bias": ("v/bias", ""),
                "attention.projection_layer.weight": ("o/weight", "t"),
                "attention.projection_layer.bias": ("o/bias", ""),
                "attention.q_norm.weight": ("q_norm/weight", ""),
                "attention.k_norm.weight": ("k_norm/weight", ""),
                "mlp.fc1.weight": ("fc1/weight", "t"),
                "mlp.fc1.bias": ("fc1/bias", ""),
                "mlp.fc2.weight": ("fc2/weight", "t"),
                "mlp.fc2.bias": ("fc2/bias", ""),
                "lambda_1": ("lambda_1", ""),
                "lambda_2": ("lambda_2", ""),
            }
            if sub in m:
                ours, tf = m[sub]
                return [(join(q, ours), None, arr.T if tf else arr)]
        return []


def pixel_shuffle(feats: jnp.ndarray, scale: float) -> jnp.ndarray:
    """HF InternVLModel.pixel_shuffle (space-to-depth, exact permute
    order). feats [B, W, H, C] -> [B, W*s, H*s, C/s^2]."""
    b, w, h, c = feats.shape
    feats = feats.reshape(b, w, int(h * scale), int(c / scale))
    feats = feats.transpose(0, 2, 1, 3)
    feats = feats.reshape(b, int(h * scale), int(w * scale),
                          int(c / (scale * scale)))
    return feats.transpose(0, 2, 1, 3)


class InternVLProjector:
    """LayerNorm -> linear -> act -> linear over pixel-shuffled features."""

    def __init__(self, hf_config, dtype):
        r = float(getattr(hf_config, "downsample_ratio", 0.5))
        self.in_dim = hf_config.vision_config.hidden_size * int(1 / r) ** 2
        self.h = hf_config.text_config.hidden_size
        self.act = _ACT.get(
            getattr(hf_config, "projector_hidden_act", "gelu"), jax.nn.gelu
        )
        self.eps = 1e-5
        self.dtype = dtype

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        return {
            join(p, "layer_norm/weight"): ParamSpec((self.in_dim,), dt),
            join(p, "layer_norm/bias"): ParamSpec((self.in_dim,), dt),
            join(p, "linear_1/weight"): ParamSpec((self.in_dim, self.h), dt),
            join(p, "linear_1/bias"): ParamSpec((self.h,), dt),
            join(p, "linear_2/weight"): ParamSpec((self.h, self.h), dt),
            join(p, "linear_2/bias"): ParamSpec((self.h,), dt),
        }

    def __call__(self, params, p, x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=-1, keepdims=True)
        v = jnp.var(xf, axis=-1, keepdims=True)
        xn = (xf - m) * jax.lax.rsqrt(v + self.eps)
        x = (xn * params[join(p, "layer_norm/weight")]
             + params[join(p, "layer_norm/bias")]).astype(x.dtype)
        x = jnp.dot(x, params[join(p, "linear_1/weight")]) + params[
            join(p, "linear_1/bias")]
        x = self.act(x)
        return jnp.dot(x, params[join(p, "linear_2/weight")]) + params[
            join(p, "linear_2/bias")]
