"""fp8 KV-cache packing (int32 transport rows).

Ref behavior: srt/layers/quantization/kv_cache.py + --kv-cache-dtype
(fp8_e5m2 / fp8_e4m3, scale-free). TPU-native storage design:

This Mosaic toolchain cannot DMA sub-int32 element types (f8/int8 pool
slices fail to compile) and requires 128-lane-aligned memref slices, so
quantized pools store each token row as INT32 LANES holding 4 packed fp8
bytes each: pool `[num_pages, page_size, F/4] int32` (F = nk*hd folded
features). The same Pallas row-DMA write kernel then scatters rows as
[F/4]-lane int32 copies, and page DMAs move exactly half the bf16 bytes.

Byte-plane layout (chosen so the Pallas kernels can decode without lane
shuffles): within each head's hd features, feature f lives at int32 lane
f % (hd/4), byte f // (hd/4). A kernel unpacking byte plane j of a head's
lanes therefore gets features [j*hd/4, (j+1)*hd/4) — reassembly is a lane
CONCAT (legal in Mosaic) instead of an interleave (not expressible).

e5m2 decode inside kernels is pure arithmetic ((1-2s)*2^(e-15)*(1+m/4));
e4m3 analogous with bias 7. XLA paths (decode attention, cascade, MLA)
bitcast through the real f8 dtypes instead — exact same values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F8_DTYPES = {
    "fp8_e5m2": jnp.float8_e5m2,
    "fp8_e4m3": jnp.float8_e4m3fn,
}


def quant_lanes(folded_dim: int) -> int:
    """int32 lanes per packed row."""
    assert folded_dim % 4 == 0, "quantized KV needs nk*hd % 4 == 0"
    return folded_dim // 4


def pack_f8(x: jax.Array, num_heads: int, fmt: str) -> jax.Array:
    """[..., num_heads * hd] float -> [..., num_heads * hd/4] int32.

    Feature f of head h -> lane h*(hd/4) + f % (hd/4), byte f // (hd/4).
    """
    f8 = F8_DTYPES[fmt]
    lead = x.shape[:-1]
    hd = x.shape[-1] // num_heads
    L = hd // 4
    b = x.reshape(lead + (num_heads, 4, L)).astype(f8)
    b = jnp.swapaxes(b, -1, -2)  # [..., nh, L, 4]
    packed = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(b, jnp.int8), jnp.int32
    )  # [..., nh, L]
    return packed.reshape(lead + (num_heads * L,))


def unpack_f8(rows: jax.Array, num_heads: int, fmt: str,
              out_dtype=jnp.bfloat16) -> jax.Array:
    """[..., num_heads * hd/4] int32 -> [..., num_heads, hd] out_dtype.

    Formulation note (round 4, measured): a shift-plane variant —
    e5m2 is truncated float16, so byte b decodes exactly as
    bitcast(u16(b << 8), f16), and the pack layout makes byte-plane
    concatenation come out in original feature order — was built and
    A/B'd against this int8-bitcast lowering at 8B decode shapes
    (32-layer chain, bs=128): bitcast 46.7 ms, shift+barrier 55.4 ms,
    shift w/o barrier 92.5 ms (XLA splits the concat back into d=32
    plane einsums). The bitcast form stays; see PERF_NOTES.md."""
    f8 = F8_DTYPES[fmt]
    lead = rows.shape[:-1]
    L = rows.shape[-1] // num_heads
    hd = 4 * L
    by = jax.lax.bitcast_convert_type(
        rows.reshape(lead + (num_heads, L)), jnp.int8
    )  # [..., nh, L, 4]
    vals = jax.lax.bitcast_convert_type(by, f8)  # same shape
    vals = jnp.swapaxes(vals, -1, -2)  # [..., nh, 4, L]
    return vals.reshape(lead + (num_heads, hd)).astype(out_dtype)


def unpack_f8_packed_order(rows: jax.Array, num_heads: int, fmt: str,
                           out_dtype=jnp.bfloat16) -> jax.Array:
    """[..., nh * hd/4] int32 -> [..., nh, hd] in PACKED feature order.

    Packed position p = l*4 + b holds original feature f = b*L + l
    (L = hd/4). Skipping the byte interleave avoids the XLA relayout
    copies `unpack_f8`'s swapaxes forces onto the (huge) gathered KV;
    attention CONTRACTS the feature dim, so callers instead permute the
    small q tensor into packed order (`to_packed_order`) and un-permute
    pv outputs (`from_packed_order`) — bit-identical results."""
    f8 = F8_DTYPES[fmt]
    lead = rows.shape[:-1]
    L = rows.shape[-1] // num_heads
    by = jax.lax.bitcast_convert_type(
        rows.reshape(lead + (num_heads, L)), jnp.int8
    )  # [..., nh, L, 4] — minor dims contiguous: reshape below is free
    vals = jax.lax.bitcast_convert_type(by, f8)
    return vals.reshape(lead + (num_heads, 4 * L)).astype(out_dtype)


def to_packed_order(x: jax.Array) -> jax.Array:
    """Permute a SMALL tensor's last (per-head feature) dim into the
    packed order produced by `unpack_f8_packed_order`."""
    s = x.shape
    L = s[-1] // 4
    return x.reshape(s[:-1] + (4, L)).swapaxes(-1, -2).reshape(s)


def from_packed_order(x: jax.Array) -> jax.Array:
    """Inverse of `to_packed_order`."""
    s = x.shape
    L = s[-1] // 4
    return x.reshape(s[:-1] + (L, 4)).swapaxes(-1, -2).reshape(s)
