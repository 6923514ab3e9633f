"""DiT: diffusion transformer denoiser (AdaLN-zero + cross-attention).

Ref: multimodal_gen/runtime/models/dits/ (the reference's DiT family —
PixArt/SD3/Flux-class blocks). Architecture here is the canonical DiT
with AdaLN-zero conditioning (timestep + pooled text) and per-block
cross-attention over the text sequence; matmuls ride the same
Column/RowParallelLinear TP layers as the LLM zoo, so GSPMD shards the
attention heads and MLP hidden over the "tp" axis.

Everything is static-shape: patchify is a reshape, the 2D sincos pos
table is precomputed for the max grid and sliced, and the whole denoise
loop scans this module (pipeline.py) — one XLA program per (B, HW,
steps) bucket.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear


def sincos_2d(dim: int, h: int, w: int) -> np.ndarray:
    """[h*w, dim] 2D sin-cos position table (DiT convention: half the
    channels encode the row, half the column)."""
    def axis(n, d):
        pos = np.arange(n, dtype=np.float64)
        omega = np.exp(
            -math.log(10000.0) * np.arange(d // 2, dtype=np.float64)
            / (d // 2)
        )
        out = pos[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # [n, d]

    gh = axis(h, dim // 2)  # [h, dim/2]
    gw = axis(w, dim // 2)  # [w, dim/2]
    emb = np.concatenate(
        [
            np.repeat(gh[:, None, :], w, axis=1),
            np.repeat(gw[None, :, :], h, axis=0),
        ],
        axis=2,
    )
    return emb.reshape(h * w, dim).astype(np.float32)


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal [B] -> [B, dim] (DDPM convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class DiTBlock:
    def __init__(self, d: int, heads: int, mlp_ratio: float, ctx_dim: int,
                 dtype):
        self.d, self.nh = d, heads
        self.hd = d // heads
        self.mlp_hidden = int(d * mlp_ratio)
        self.dtype = dtype
        self.qkv = ColumnParallelLinear(d, 3 * d, dtype, bias=True)
        self.attn_out = RowParallelLinear(d, d, dtype, bias=True)
        self.x_q = ColumnParallelLinear(d, d, dtype, bias=True)
        self.x_kv = ColumnParallelLinear(ctx_dim, 2 * d, dtype, bias=True)
        self.x_out = RowParallelLinear(d, d, dtype, bias=True)
        self.mlp_in = ColumnParallelLinear(d, self.mlp_hidden, dtype,
                                           bias=True)
        self.mlp_out = RowParallelLinear(self.mlp_hidden, d, dtype,
                                         bias=True)

    def specs(self, p: str) -> SpecTree:
        s: SpecTree = {
            # AdaLN-zero: 9 modulation vectors (shift/scale/gate for
            # self-attn, cross-attn, mlp). Zero-init => identity block at
            # start (the "-zero" in AdaLN-zero).
            join(p, "adaln/weight"): ParamSpec(
                (self.d, 9 * self.d), self.dtype, P(), init_scale=0.0
            ),
            join(p, "adaln/bias"): ParamSpec(
                (9 * self.d,), self.dtype, P(), init_scale=0.0
            ),
        }
        s.update(self.qkv.specs(join(p, "attn/qkv")))
        s.update(self.attn_out.specs(join(p, "attn/out")))
        s.update(self.x_q.specs(join(p, "xattn/q")))
        s.update(self.x_kv.specs(join(p, "xattn/kv")))
        s.update(self.x_out.specs(join(p, "xattn/out")))
        s.update(self.mlp_in.specs(join(p, "mlp/in")))
        s.update(self.mlp_out.specs(join(p, "mlp/out")))
        return s

    @staticmethod
    def _ln(x):
        # AdaLN uses elementwise-affine-free LayerNorm.
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return (x32 - mu) * jax.lax.rsqrt(var + 1e-6)

    def _mha(self, q, k, v):
        B, N, _ = q.shape
        L = k.shape[1]
        q = q.reshape(B, N, self.nh, self.hd)
        k = k.reshape(B, L, self.nh, self.hd)
        v = v.reshape(B, L, self.nh, self.hd)
        s = jnp.einsum("bnhd,blhd->bhnl", q, k,
                       preferred_element_type=jnp.float32)
        s *= self.hd**-0.5
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhnl,blhd->bnhd", a, v)
        return o.reshape(B, N, self.d)

    def __call__(self, params, p, x, cond, ctx):
        """x [B, N, D]; cond [B, D] (t + pooled text); ctx [B, L, Dc]."""
        mod = (
            jax.nn.silu(cond.astype(jnp.float32))
            @ params[join(p, "adaln/weight")].astype(jnp.float32)
            + params[join(p, "adaln/bias")].astype(jnp.float32)
        )
        (sa_sh, sa_sc, sa_g, xa_sh, xa_sc, xa_g, m_sh, m_sc, m_g) = (
            jnp.split(mod, 9, axis=-1)
        )

        def moded(x, sh, sc):
            return (self._ln(x) * (1 + sc[:, None]) + sh[:, None]).astype(
                self.dtype
            )

        h = moded(x, sa_sh, sa_sc)
        qkv = self.qkv(params, p + "/attn/qkv", h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = self.attn_out(params, p + "/attn/out", self._mha(q, k, v))
        x = x + sa_g[:, None].astype(x.dtype) * att

        h = moded(x, xa_sh, xa_sc)
        q = self.x_q(params, p + "/xattn/q", h)
        kv = self.x_kv(params, p + "/xattn/kv", ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        xat = self.x_out(params, p + "/xattn/out", self._mha(q, k, v))
        x = x + xa_g[:, None].astype(x.dtype) * xat

        h = moded(x, m_sh, m_sc)
        h = jax.nn.gelu(self.mlp_in(params, p + "/mlp/in", h))
        h = self.mlp_out(params, p + "/mlp/out", h)
        return x + m_g[:, None].astype(x.dtype) * h


class DiT:
    """Patch-in / patch-out denoiser over VAE latents."""

    def __init__(self, *, in_channels: int, hidden_size: int, depth: int,
                 num_heads: int, patch_size: int, ctx_dim: int,
                 max_grid: int = 64, mlp_ratio: float = 4.0,
                 dtype=jnp.bfloat16):
        self.c = in_channels
        self.d = hidden_size
        self.depth = depth
        self.p = patch_size
        self.ctx_dim = ctx_dim
        self.dtype = dtype
        self.max_grid = max_grid
        self.blocks = [
            DiTBlock(hidden_size, num_heads, mlp_ratio, ctx_dim, dtype)
            for _ in range(depth)
        ]
        self.patch_in = ColumnParallelLinear(
            in_channels * patch_size**2, hidden_size, dtype, bias=True
        )
        self.t_mlp1 = ColumnParallelLinear(256, hidden_size, dtype, bias=True)
        self.t_mlp2 = RowParallelLinear(hidden_size, hidden_size, dtype,
                                        bias=True)
        self.ctx_pool = ColumnParallelLinear(ctx_dim, hidden_size, dtype,
                                             bias=True)
        self._pos = sincos_2d(hidden_size, max_grid, max_grid).reshape(
            max_grid, max_grid, hidden_size
        )

    def param_specs(self) -> SpecTree:
        s: SpecTree = {}
        s.update(self.patch_in.specs("patch_in"))
        s.update(self.t_mlp1.specs("t_mlp/fc1"))
        s.update(self.t_mlp2.specs("t_mlp/fc2"))
        s.update(self.ctx_pool.specs("ctx_pool"))
        for i, b in enumerate(self.blocks):
            s.update(b.specs(f"blocks/{i}"))
        s.update({
            "final/adaln/weight": ParamSpec(
                (self.d, 2 * self.d), self.dtype, P(), init_scale=0.0),
            "final/adaln/bias": ParamSpec(
                (2 * self.d,), self.dtype, P(), init_scale=0.0),
            "final/out/weight": ParamSpec(
                (self.d, self.c * self.p**2), self.dtype, P(),
                init_scale=0.0),
            "final/out/bias": ParamSpec(
                (self.c * self.p**2,), self.dtype, P(), init_scale=0.0),
        })
        return s

    def __call__(self, params: Params, x: jax.Array, t: jax.Array,
                 ctx: jax.Array, pooled: Optional[jax.Array] = None):
        """x [B, C, H, W]; t [B]; ctx [B, L, ctx_dim] -> v/eps [B,C,H,W]."""
        B, C, H, W = x.shape
        p = self.p
        gh, gw = H // p, W // p
        # patchify: [B, C, gh, p, gw, p] -> [B, gh*gw, C*p*p]
        xp = x.reshape(B, C, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5)
        xp = xp.reshape(B, gh * gw, C * p * p).astype(self.dtype)
        h = self.patch_in(params, "patch_in", xp)
        pos = jnp.asarray(
            self._pos[:gh, :gw].reshape(gh * gw, self.d), self.dtype
        )
        h = h + pos[None]

        te = timestep_embedding(t, 256).astype(self.dtype)
        te = self.t_mlp2(
            params, "t_mlp/fc2",
            jax.nn.silu(self.t_mlp1(params, "t_mlp/fc1", te)),
        )
        pool = ctx.mean(axis=1) if pooled is None else pooled
        cond = te + self.ctx_pool(params, "ctx_pool", pool.astype(self.dtype))

        ctx = ctx.astype(self.dtype)
        for i, b in enumerate(self.blocks):
            h = b(params, f"blocks/{i}", h, cond, ctx)

        mod = (
            jax.nn.silu(cond.astype(jnp.float32))
            @ params["final/adaln/weight"].astype(jnp.float32)
            + params["final/adaln/bias"].astype(jnp.float32)
        )
        sh, sc = jnp.split(mod, 2, axis=-1)
        h = (DiTBlock._ln(h) * (1 + sc[:, None]) + sh[:, None]).astype(
            self.dtype
        )
        out = h @ params["final/out/weight"] + params["final/out/bias"]
        # unpatchify
        out = out.reshape(B, gh, gw, C, p, p).transpose(0, 3, 1, 4, 2, 5)
        return out.reshape(B, C, H, W).astype(jnp.float32)

    # ------------------------------------------------------------ weights
    def map_hf_weight(self, name: str, arr: np.ndarray):
        """Checkpoint names are this module's own canonical layout:
        '<param_path>' with torch Linear [out, in] transposed on load."""
        if name.endswith("/weight") and arr.ndim == 2:
            yield name, None, arr.T
        else:
            yield name, None, arr
