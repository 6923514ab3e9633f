"""Weight quantization subsystem (TPU-native).

Ref behavior: srt/layers/quantization/{fp8.py,w8a8_int8.py,base_config.py}.
The reference ships per-layer CUDA quant kernels; on TPU the idiomatic
shape is (a) quantized STORAGE in the param dict — int8 / fp8_e4m3 weights
with per-output-channel float32 scales — and (b) XLA-fused dequant inside
the matmul (`q.astype(bf16) * scale` folds into the dot's operand read),
or a true int8xint8->int32 MXU dot for the w8a8 path.

Methods:
- "int8"      — weight-only W8A16: int8 storage, bf16 math. Halves weight
                HBM streaming; bit-identical activations path.
- "int4"      — weight-only W4A16: two nibbles packed per int8 byte
                along the contraction axis (interleaved pairs, so
                tp-sharded axes stay shard-local), bf16 math via a
                two-dot formulation whose nibble shifts fuse into the
                dot reads. Quarter the weight bytes of bf16 — the
                capacity lever that lets an 8B model serve larger
                batches on a 16 GB chip. (Native XLA s4 arrays break
                the tunneled-TPU PJRT path, hence explicit packing.)
                Ref analog: AWQ/GPTQ-class int4
                (srt/layers/quantization/awq/), minus the zero-point /
                group machinery (symmetric per-channel).
- "fp8"       — weight-only: float8_e4m3fn storage, bf16 math.
- "w8a8_int8" — int8 weights + dynamic per-token int8 activations; the
                dot runs int8xint8->int32 (MXU-native on TPUs that
                support it; XLA converts elsewhere), rescaled by
                act_scale x weight_scale.

Mechanics: quantized layers emit their weight ParamSpec with
`quant_method`/`quant_axes` set; the loader (model_exec/weight_loader.py)
and dummy initializer materialize `<name>` as the quantized tensor plus
`<name>/qscale` (float32, the non-reduced dims). Layers read the pair at
call time. The method is process-global (set from --quantization before
model construction), mirroring the reference's quant-config plumbing
(srt/layers/quantization/base_config.py) without per-layer objects.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

_QUANT_METHOD: Optional[str] = None

WEIGHT_DTYPES = {
    "int8": jnp.int8,
    "int4": jnp.int8,  # storage: nibble pairs packed per byte
    "w8a8_int8": jnp.int8,
    "fp8": jnp.float8_e4m3fn,
}
_QMAX = {"int8": 127.0, "int4": 7.0, "w8a8_int8": 127.0, "fp8": 448.0}


def set_quant_method(method: Optional[str]) -> None:
    global _QUANT_METHOD
    if method is not None and method not in WEIGHT_DTYPES:
        raise ValueError(
            f"unknown --quantization {method!r}; have {sorted(WEIGHT_DTYPES)}"
        )
    _QUANT_METHOD = method


def get_quant_method() -> Optional[str]:
    return _QUANT_METHOD


def scale_shape(shape: Tuple[int, ...], axes: Tuple[int, ...]) -> Tuple[int, ...]:
    """Scale tensor shape: weight shape with the reduced axes dropped."""
    return tuple(d for i, d in enumerate(shape) if i not in axes)


def scale_spec(spec: P, axes: Tuple[int, ...], ndim: int) -> P:
    """Scale sharding: the weight's PartitionSpec with reduced axes dropped."""
    entries = list(spec) + [None] * (ndim - len(list(spec)))
    return P(*(e for i, e in enumerate(entries) if i not in axes))


def quantize_np(
    w: np.ndarray, method: str, axes: Tuple[int, ...]
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side symmetric per-channel quantization (load time)."""
    amax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.maximum(amax / _QMAX[method], 1e-8).astype(np.float32)
    q = w / scale
    if method in ("int8", "w8a8_int8"):
        qw = np.clip(np.rint(q), -127, 127).astype(np.int8)
    elif method == "int4":
        q4 = np.clip(np.rint(q), -7, 7).astype(np.int8)
        qw = pack_int4(q4, axes[0])
    else:
        import ml_dtypes

        qw = np.clip(q, -448, 448).astype(ml_dtypes.float8_e4m3fn)
    return qw, np.squeeze(scale, axis=axes)


def pack_int4(q: np.ndarray, axis: int) -> np.ndarray:
    """int8 values in [-7, 7] -> nibble-packed int8, halving `axis`.
    Pairs are INTERLEAVED along the axis (2i, 2i+1 share a byte) so a
    tp-sharded axis packs shard-locally for any even shard size."""
    q = np.moveaxis(q, axis, 0)
    assert q.shape[0] % 2 == 0, "int4 needs an even contraction dim"
    lo, hi = q[0::2], q[1::2]
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.int8)
    return np.moveaxis(packed, 0, axis)


def unpack_int4(p, axis: int):
    """Packed int8 -> int8 with `axis` doubled (jnp or np arrays)."""
    xp = jnp if isinstance(p, jax.Array) else np
    p = xp.moveaxis(p, axis, 0)
    lo = xp.right_shift(xp.left_shift(p, 4), 4)  # arithmetic: sign-extend
    hi = xp.right_shift(p, 4)
    out = xp.stack([lo, hi], axis=1).reshape((2 * p.shape[0],) + p.shape[1:])
    return xp.moveaxis(out, 0, axis)


def full_weight(params, name: str, dtype, axes: Tuple[int, ...] = (0,)):
    """Read a (possibly quantized) weight back as a dense array — for
    paths that consume the raw matrix (e.g. MLA W_UK/W_UV absorption)."""
    w = params[name]
    s = params.get(name + "/qscale")
    if s is None:
        return w
    if _QUANT_METHOD == "int4":
        w = unpack_int4(w, axes[0])
    return w.astype(dtype) * jnp.expand_dims(s, axes).astype(dtype)


def dequant_matmul(
    x: jax.Array,
    qweight: jax.Array,
    scale: jax.Array,
    method: str,
    dimension_numbers=None,
) -> jax.Array:
    """Quantized matmul. x: [..., in]; qweight: [in, ...out]; scale [..out]."""
    if dimension_numbers is None:
        dimension_numbers = (((x.ndim - 1,), (0,)), ((), ()))
    if method == "w8a8_int8":
        # Dynamic per-token activation quantization; int8 MXU dot.
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        xs = jnp.maximum(amax / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, qweight, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        # xs is [..., 1] over x's batch dims; pad to y's rank (the weight
        # may contribute >1 output dims, e.g. fused [in, n, out]).
        xs = xs.reshape(xs.shape[:-1] + (1,) * (y.ndim - (x.ndim - 1)))
        out = y * xs.astype(jnp.float32) * scale
        return out.astype(x.dtype)
    if method == "int4":
        # Nibble-packed pairs along the weight's contraction axis (0):
        # two dots over the even/odd sub-weights; the shift/sign-extend
        # chains fuse into the dot operand reads like the int8 astype.
        (xc,), (wc,) = dimension_numbers[0]
        assert wc == 0 and xc == x.ndim - 1, (
            "int4 dequant_matmul expects contraction on w-axis 0 / "
            "x's last axis"
        )
        lo = jnp.right_shift(jnp.left_shift(qweight, 4), 4)
        hi = jnp.right_shift(qweight, 4)
        xp = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
        y = jax.lax.dot_general(
            xp[..., 0], lo.astype(x.dtype),
            dimension_numbers=dimension_numbers,
            preferred_element_type=x.dtype,
        ) + jax.lax.dot_general(
            xp[..., 1], hi.astype(x.dtype),
            dimension_numbers=dimension_numbers,
            preferred_element_type=x.dtype,
        )
        return y * scale.astype(x.dtype)
    # Weight-only: dequant folds into the dot's weight read.
    y = jax.lax.dot_general(
        x, qweight.astype(x.dtype), dimension_numbers=dimension_numbers,
        preferred_element_type=x.dtype,
    )
    return y * scale.astype(x.dtype)
