"""Rotary position embeddings. Ref: srt/layers/rotary_embedding/base.py:78.

Implements the HF/neox interleaving convention (rotate_half) used by
Llama/Qwen/Mistral families, plus llama3-style frequency scaling and
linear/dynamic-NTK scaling. cos/sin tables are precomputed once on device
and gathered by position inside jit — no per-step host work.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def compute_inv_freq(head_dim: int, rope_theta: float) -> jnp.ndarray:
    return 1.0 / (
        rope_theta
        ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def apply_llama3_scaling(
    inv_freq: jnp.ndarray,
    factor: float,
    low_freq_factor: float,
    high_freq_factor: float,
    original_max_position: int,
) -> jnp.ndarray:
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2 * math.pi / inv_freq
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    scaled = jnp.where(
        wavelen > low_freq_wavelen,
        inv_freq / factor,
        jnp.where(
            wavelen < high_freq_wavelen,
            inv_freq,
            (1 - smooth) * inv_freq / factor + smooth * inv_freq,
        ),
    )
    return scaled


def apply_yarn_scaling(
    rotary_dim: int,
    rope_theta: float,
    scaling: dict,
    max_position: int,
):
    """YaRN (arXiv 2309.00071) frequency interpolation + attention mscale.

    Matches HF _compute_yarn_parameters (incl. DeepSeek's mscale/
    mscale_all_dim variant and GPT-OSS's truncate=False). Returns
    (inv_freq, attention_factor)."""
    import numpy as np

    dim = rotary_dim
    factor = scaling["factor"]
    original_max = (
        scaling.get("original_max_position_embeddings") or max_position
    )
    attention_factor = scaling.get("attention_factor")
    mscale = scaling.get("mscale")
    mscale_all_dim = scaling.get("mscale_all_dim")

    def get_mscale(scale, m=1.0):
        if scale <= 1:
            return 1.0
        return 0.1 * m * math.log(scale) + 1.0

    if attention_factor is None:
        if mscale and mscale_all_dim:
            attention_factor = float(
                get_mscale(factor, mscale) / get_mscale(factor, mscale_all_dim)
            )
        else:
            attention_factor = get_mscale(factor)

    beta_fast = scaling.get("beta_fast") or 32
    beta_slow = scaling.get("beta_slow") or 1
    truncate = scaling.get("truncate", True)

    def correction_dim(num_rotations):
        return (dim * math.log(original_max / (num_rotations * 2 * math.pi))
                ) / (2 * math.log(rope_theta))

    low = correction_dim(beta_fast)
    high = correction_dim(beta_slow)
    if truncate:
        low = math.floor(low)
        high = math.ceil(high)
    low = max(low, 0)
    high = min(high, dim - 1)
    if low == high:
        high += 0.001

    pos_freqs = rope_theta ** (
        np.arange(0, dim, 2, dtype=np.float32) / dim
    )
    inv_extrap = 1.0 / pos_freqs
    inv_interp = 1.0 / (factor * pos_freqs)
    ramp = np.clip(
        (np.arange(dim // 2, dtype=np.float32) - low) / (high - low), 0, 1
    )
    extrap_factor = 1 - ramp
    inv_freq = inv_interp * (1 - extrap_factor) + inv_extrap * extrap_factor
    return jnp.asarray(inv_freq, jnp.float32), float(attention_factor)


class RotaryEmbedding:
    def __init__(
        self,
        head_dim: int,
        rotary_dim: Optional[int],
        max_position: int,
        rope_theta: float,
        rope_scaling: Optional[dict] = None,
        interleaved: bool = False,
    ):
        self.head_dim = head_dim
        self.rotary_dim = rotary_dim or head_dim
        self.max_position = max_position
        # GPT-J-style pair interleaving (Llama4 apply_rotary_emb's complex
        # rotation over (x[2i], x[2i+1]) pairs) vs the default neox
        # rotate-half convention.
        self.interleaved = interleaved
        inv_freq = compute_inv_freq(self.rotary_dim, rope_theta)
        mscale = 1.0
        if rope_scaling:
            rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
            if rtype == "llama3":
                inv_freq = apply_llama3_scaling(
                    inv_freq,
                    rope_scaling["factor"],
                    rope_scaling["low_freq_factor"],
                    rope_scaling["high_freq_factor"],
                    rope_scaling["original_max_position_embeddings"],
                )
            elif rtype == "linear":
                inv_freq = inv_freq / rope_scaling["factor"]
            elif rtype == "dynamic":
                # Dynamic NTK: recompute theta for the max length we serve.
                factor = rope_scaling["factor"]
                theta = rope_theta * (
                    (factor * max_position / rope_scaling.get(
                        "original_max_position_embeddings", max_position
                    ) - (factor - 1))
                    ** (self.rotary_dim / (self.rotary_dim - 2))
                )
                inv_freq = compute_inv_freq(self.rotary_dim, theta)
            elif rtype == "yarn":
                inv_freq, mscale = apply_yarn_scaling(
                    self.rotary_dim, rope_theta, rope_scaling, max_position
                )
            elif rtype == "longrope":
                # Phi-3/PhiMoE LongRoPE (HF _compute_longrope_parameters):
                # per-frequency short/long scale factors; positions beyond
                # original_max use the long factors. The caller injects
                # original_max_position_embeddings into the scaling dict
                # (HF keeps it on the config object).
                import numpy as np

                orig = int(
                    rope_scaling.get("original_max_position_embeddings")
                    or max_position
                )
                factor = max_position / orig
                mscale = rope_scaling.get("attention_factor")
                if mscale is None:
                    mscale = (
                        1.0 if factor <= 1.0
                        else math.sqrt(1 + math.log(factor) / math.log(orig))
                    )
                # PhiMoE overrides the paper mscale with explicit
                # short/long ones (HF PhimoeRotaryEmbedding.forward).
                ms_s = rope_scaling.get("short_mscale") or mscale
                ms_l = rope_scaling.get("long_mscale") or mscale
                base = np.asarray(compute_inv_freq(self.rotary_dim, rope_theta))
                short = base / np.asarray(
                    rope_scaling["short_factor"], np.float32
                )
                long = base / np.asarray(
                    rope_scaling["long_factor"], np.float32
                )
                t = np.arange(max_position, dtype=np.float32)
                in_short = (t < orig)[:, None]
                freqs = np.where(in_short, np.outer(t, short), np.outer(t, long))
                ms = np.where(in_short, ms_s, ms_l)
                self.cos_table = jnp.asarray(np.cos(freqs) * ms)
                self.sin_table = jnp.asarray(np.sin(freqs) * ms)
                return
            elif rtype in ("default", "mrope", ""):
                pass
        t = jnp.arange(max_position, dtype=jnp.float32)
        freqs = jnp.outer(t, inv_freq)  # [max_pos, rot/2]
        self.cos_table = jnp.cos(freqs) * mscale  # float32
        self.sin_table = jnp.sin(freqs) * mscale

    def __call__(
        self, positions: jax.Array, q: jax.Array, k: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """positions: [T]; q: [T, nq, hd]; k: [T, nk, hd]."""
        cos = self.cos_table[positions][:, None, :]  # [T, 1, rot/2]
        sin = self.sin_table[positions][:, None, :]
        fn = _apply_gptj if self.interleaved else _apply_neox
        q = fn(q, cos, sin, self.rotary_dim)
        k = fn(k, cos, sin, self.rotary_dim)
        return q, k


def _apply_gptj(x: jax.Array, cos, sin, rotary_dim: int) -> jax.Array:
    """Interleaved-pair rotation: (x[2i], x[2i+1]) rotated by freq i."""
    dtype = x.dtype
    rot = x[..., :rotary_dim].astype(jnp.float32)
    x1 = rot[..., 0::2]
    x2 = rot[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape).astype(dtype)
    if rotary_dim == x.shape[-1]:
        return out
    return jnp.concatenate([out, x[..., rotary_dim:]], axis=-1)


def _apply_neox(x: jax.Array, cos, sin, rotary_dim: int) -> jax.Array:
    dtype = x.dtype
    rot = x[..., :rotary_dim].astype(jnp.float32)
    x1, x2 = rot[..., : rotary_dim // 2], rot[..., rotary_dim // 2 :]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = jnp.concatenate([o1, o2], axis=-1).astype(dtype)
    if rotary_dim == x.shape[-1]:
        return out
    return jnp.concatenate([out, x[..., rotary_dim:]], axis=-1)


class MRotaryEmbedding(RotaryEmbedding):
    """Multimodal 3-D rope (Qwen2-VL; ref HF apply_multimodal_rotary_pos_emb
    + srt rotary mrope). The rotary half-dims are partitioned into
    mrope_section = [t, h, w] blocks; each block reads its cos/sin at the
    corresponding position component. With all components equal (pure
    text / decode) this reduces exactly to 1-D neox rope.
    """

    def __init__(self, head_dim, rotary_dim, max_position, rope_theta,
                 rope_scaling):
        super().__init__(head_dim, rotary_dim, max_position, rope_theta,
                         rope_scaling)
        section = rope_scaling["mrope_section"]  # sums to rotary_dim/2
        sec_idx = []
        for s, n in enumerate(section):
            sec_idx.extend([s] * n)
        self.sec_onehot = jax.nn.one_hot(
            jnp.asarray(sec_idx, jnp.int32), len(section), dtype=jnp.float32
        ).T  # [3, rot/2]

    def call_mrope(self, mrope_positions: jax.Array, q, k):
        """mrope_positions [3, T]."""
        cos3 = self.cos_table[mrope_positions]  # [3, T, rot/2]
        sin3 = self.sin_table[mrope_positions]
        cos = jnp.einsum("std,sd->td", cos3, self.sec_onehot)[:, None, :]
        sin = jnp.einsum("std,sd->td", sin3, self.sec_onehot)[:, None, :]
        q = _apply_neox(q, cos, sin, self.rotary_dim)
        k = _apply_neox(k, cos, sin, self.rotary_dim)
        return q, k
