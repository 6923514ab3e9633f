"""Qwen2-VL vision tower (functional JAX).

Behavioral reference: srt/models/qwen2_vl.py (Qwen2VisionTransformer) + HF
Qwen2VLVisionModel numerics: conv3d patch embed (as a matmul over
flattened patches), blocks with 2D rotary attention (h/w position halves),
QuickGELU MLP, and a 2x2 PatchMerger. Patch rows arrive in HF's
merge-block order (multimodal/processors.py), so consecutive groups of
merge^2 rows form one output token.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.multimodal.vision_clip import _ACT


def _rot_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


class Qwen2VLVisionTower:
    def __init__(self, vision_config, dtype):
        vc = vision_config
        self.depth = vc.depth
        self.width = vc.embed_dim
        self.heads = vc.num_heads
        self.head_dim = self.width // self.heads
        self.ps = vc.patch_size
        self.tps = vc.temporal_patch_size
        self.merge = vc.spatial_merge_size
        self.out_hidden = vc.hidden_size
        self.inter = int(self.width * vc.mlp_ratio)
        self.act = _ACT[getattr(vc, "hidden_act", "quick_gelu")]
        self.dtype = dtype
        self.in_feat = 3 * self.tps * self.ps * self.ps

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        W, I = self.width, self.inter
        mh = W * self.merge * self.merge
        s = {
            join(p, "patch_embed/weight"): ParamSpec((self.in_feat, W), dt),
            join(p, "merger_ln/weight"): ParamSpec((W,), dt),
            join(p, "merger_ln/bias"): ParamSpec((W,), dt),
            join(p, "merger_fc1/weight"): ParamSpec((mh, mh), dt),
            join(p, "merger_fc1/bias"): ParamSpec((mh,), dt),
            join(p, "merger_fc2/weight"): ParamSpec((mh, self.out_hidden), dt),
            join(p, "merger_fc2/bias"): ParamSpec((self.out_hidden,), dt),
        }
        for i in range(self.depth):
            q = join(p, f"blocks/{i}")
            for name, shape in (
                ("norm1/weight", (W,)), ("norm1/bias", (W,)),
                ("norm2/weight", (W,)), ("norm2/bias", (W,)),
                ("qkv/weight", (W, 3 * W)), ("qkv/bias", (3 * W,)),
                ("proj/weight", (W, W)), ("proj/bias", (W,)),
                ("fc1/weight", (W, I)), ("fc1/bias", (I,)),
                ("fc2/weight", (I, W)), ("fc2/bias", (W,)),
            ):
                s[join(q, name)] = ParamSpec(shape, dt)
        return s

    @staticmethod
    def _ln(params, p, x, eps=1e-6):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * params[
            join(p, "weight")
        ] + params[join(p, "bias")]

    def rot_tables(self, grid_thw: Tuple[int, int, int]) -> np.ndarray:
        """Per-patch (h, w) rotary freqs in HF's merge-block row order ->
        [n_patches, head_dim/2] (h freqs ++ w freqs)."""
        t, h, w = grid_thw
        m = self.merge
        dim = self.head_dim // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, np.float32) / dim))
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def blocked(x):
            return (
                x.reshape(h // m, m, w // m, m)
                .transpose(0, 2, 1, 3)
                .reshape(-1)
            )

        hp, wp = blocked(hpos), blocked(wpos)
        freqs = np.concatenate(
            [np.outer(hp, inv), np.outer(wp, inv)], axis=-1
        )  # [h*w, dim]
        return np.tile(freqs, (t, 1)).astype(np.float32)

    def __call__(self, params: Params, p: str, rows: jax.Array,
                 rot_freqs: jax.Array, frame_len: int = 0) -> jax.Array:
        """rows [N, 3*tps*ps*ps] (one image/video); rot_freqs
        [N, head_dim/2] -> merged features [N/merge^2, out_hidden].
        frame_len > 0 (= grid_h*grid_w, videos): attention is
        block-diagonal per temporal frame, matching HF's cu_seqlens
        (Qwen2VLVisionModel builds h*w-long segments per t)."""
        N = rows.shape[0]
        frame_mask = None
        if frame_len and frame_len < N:
            blk = jnp.arange(N, dtype=jnp.int32) // frame_len
            frame_mask = blk[:, None] == blk[None, :]  # [N, N]
        x = jnp.dot(rows.astype(self.dtype),
                    params[join(p, "patch_embed/weight")])
        emb = jnp.concatenate([rot_freqs, rot_freqs], axis=-1)  # [N, hd]
        cos = jnp.cos(emb)[:, None, :]
        sin = jnp.sin(emb)[:, None, :]

        for i in range(self.depth):
            q = join(p, f"blocks/{i}")
            h = self._ln(params, join(q, "norm1"), x)
            qkv = jnp.dot(h, params[join(q, "qkv/weight")]) + params[
                join(q, "qkv/bias")
            ]
            qkv = qkv.reshape(N, 3, self.heads, self.head_dim)
            qh, kh, vh = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            qh = (qh.astype(jnp.float32) * cos
                  + _rot_half(qh.astype(jnp.float32)) * sin).astype(x.dtype)
            kh = (kh.astype(jnp.float32) * cos
                  + _rot_half(kh.astype(jnp.float32)) * sin).astype(x.dtype)
            scores = jnp.einsum(
                "qhd,khd->hqk", qh, kh, preferred_element_type=jnp.float32
            ) * (self.head_dim**-0.5)
            if frame_mask is not None:
                scores = jnp.where(frame_mask[None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
            o = jnp.einsum("hqk,khd->qhd", probs, vh).reshape(N, self.width)
            x = x + jnp.dot(o, params[join(q, "proj/weight")]) + params[
                join(q, "proj/bias")
            ]
            h = self._ln(params, join(q, "norm2"), x)
            h = self.act(
                jnp.dot(h, params[join(q, "fc1/weight")])
                + params[join(q, "fc1/bias")]
            )
            x = x + jnp.dot(h, params[join(q, "fc2/weight")]) + params[
                join(q, "fc2/bias")
            ]

        # PatchMerger: ln over width, group merge^2 consecutive rows.
        x = self._ln(params, join(p, "merger_ln"), x)
        mh = self.width * self.merge * self.merge
        x = x.reshape(-1, mh)
        x = jax.nn.gelu(
            jnp.dot(x, params[join(p, "merger_fc1/weight")])
            + params[join(p, "merger_fc1/bias")],
            approximate=False,
        )
        return jnp.dot(x, params[join(p, "merger_fc2/weight")]) + params[
            join(p, "merger_fc2/bias")
        ]

    def map_hf_weight(self, n: str, arr: np.ndarray, prefix: str):
        """visual.* names -> ours."""
        if n == "patch_embed.proj.weight":
            # [W, 3, tps, ps, ps] -> [3*tps*ps*ps, W]
            return [(join(prefix, "patch_embed/weight"), None,
                     arr.reshape(arr.shape[0], -1).T)]
        m = {
            "merger.ln_q.weight": ("merger_ln/weight", ""),
            "merger.ln_q.bias": ("merger_ln/bias", ""),
            "merger.mlp.0.weight": ("merger_fc1/weight", "t"),
            "merger.mlp.0.bias": ("merger_fc1/bias", ""),
            "merger.mlp.2.weight": ("merger_fc2/weight", "t"),
            "merger.mlp.2.bias": ("merger_fc2/bias", ""),
        }
        if n in m:
            ours, tf = m[n]
            return [(join(prefix, ours), None, arr.T if tf else arr)]
        if n.startswith("blocks."):
            rest = n[len("blocks."):]
            idx, sub = rest.split(".", 1)
            q = join(prefix, f"blocks/{idx}")
            m2 = {
                "norm1.weight": ("norm1/weight", ""),
                "norm1.bias": ("norm1/bias", ""),
                "norm2.weight": ("norm2/weight", ""),
                "norm2.bias": ("norm2/bias", ""),
                "attn.qkv.weight": ("qkv/weight", "t"),
                "attn.qkv.bias": ("qkv/bias", ""),
                "attn.proj.weight": ("proj/weight", "t"),
                "attn.proj.bias": ("proj/bias", ""),
                "mlp.fc1.weight": ("fc1/weight", "t"),
                "mlp.fc1.bias": ("fc1/bias", ""),
                "mlp.fc2.weight": ("fc2/weight", "t"),
                "mlp.fc2.bias": ("fc2/bias", ""),
            }
            if sub in m2:
                ours, tf = m2[sub]
                return [(join(q, ours), None, arr.T if tf else arr)]
        return []
