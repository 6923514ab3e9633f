"""VAE decoder/encoder for latent diffusion.

Ref: multimodal_gen/runtime/models/vaes/ (AutoencoderKL-class). A
compact SD-style conv autoencoder: resnet blocks (GroupNorm + SiLU +
3x3 conv) with nearest-neighbor 2x upsampling per stage. Convs lower to
XLA's conv_general_dilated in NCHW; bfloat16 throughout with float32
GroupNorm statistics.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join


def _conv_specs(p: str, cin: int, cout: int, k: int, dtype) -> SpecTree:
    return {
        join(p, "weight"): ParamSpec((cout, cin, k, k), dtype, P(),
                                     init_scale=0.05),
        join(p, "bias"): ParamSpec((cout,), dtype, P(), init_scale=0.0),
    }


def _conv(params, p, x, stride: int = 1, pad: int = 1):
    w = params[join(p, "weight")]
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + params[join(p, "bias")][None, :, None, None]


def _gn(x, groups: int = 8, eps: float = 1e-6):
    B, C, H, W = x.shape
    g = x.astype(jnp.float32).reshape(B, groups, C // groups, H, W)
    mu = g.mean(axis=(2, 3, 4), keepdims=True)
    var = g.var(axis=(2, 3, 4), keepdims=True)
    return ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(B, C, H, W)


class _ResBlock:
    def __init__(self, cin: int, cout: int, dtype):
        self.cin, self.cout, self.dtype = cin, cout, dtype

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(_conv_specs(join(p, "conv1"), self.cin, self.cout, 3,
                             self.dtype))
        s.update(_conv_specs(join(p, "conv2"), self.cout, self.cout, 3,
                             self.dtype))
        if self.cin != self.cout:
            s.update(_conv_specs(join(p, "skip"), self.cin, self.cout, 1,
                                 self.dtype))
        return s

    def __call__(self, params, p, x):
        h = _conv(params, join(p, "conv1"), jax.nn.silu(_gn(x)))
        h = _conv(params, join(p, "conv2"), jax.nn.silu(_gn(h)))
        if self.cin != self.cout:
            x = _conv(params, join(p, "skip"), x, pad=0)
        return x + h


class VAEDecoder:
    """latents [B, zc, h, w] -> images [B, 3, h*2^k, w*2^k] in [-1, 1]."""

    def __init__(self, *, z_channels: int, channels: List[int],
                 dtype=jnp.bfloat16, scaling_factor: float = 0.18215):
        # channels, deepest first, e.g. [128, 64, 32]: k = len-1 upsamples.
        self.zc = z_channels
        self.channels = channels
        self.dtype = dtype
        self.scaling_factor = scaling_factor
        self.blocks: List[Tuple[str, _ResBlock]] = []
        prev = channels[0]
        for i, c in enumerate(channels):
            self.blocks.append((f"up/{i}", _ResBlock(prev, c, dtype)))
            prev = c

    def param_specs(self) -> SpecTree:
        s: SpecTree = {}
        s.update(_conv_specs("conv_in", self.zc, self.channels[0], 3,
                             self.dtype))
        s.update(_ResBlock(self.channels[0], self.channels[0],
                           self.dtype).specs("mid"))
        for name, b in self.blocks:
            s.update(b.specs(name))
        s.update(_conv_specs("conv_out", self.channels[-1], 3, 3,
                             self.dtype))
        return s

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        x = _conv(params, "conv_in", z / self.scaling_factor)
        x = _ResBlock(self.channels[0], self.channels[0], self.dtype)(
            params, "mid", x
        )
        for i, (name, b) in enumerate(self.blocks):
            if i > 0:  # nearest 2x upsample between stages
                B, C, H, W = x.shape
                x = jnp.broadcast_to(
                    x[:, :, :, None, :, None], (B, C, H, 2, W, 2)
                ).reshape(B, C, 2 * H, 2 * W)
            x = b(params, name, x)
        x = _conv(params, "conv_out", jax.nn.silu(_gn(x)))
        return jnp.tanh(x.astype(jnp.float32))

    def map_hf_weight(self, name: str, arr: np.ndarray):
        yield name, None, arr
