"""Pallas KV-write kernel: scatter new tokens' K/V rows into split pools.

Replaces the XLA scatter (which on this TPU toolchain lowers to a
catastrophically slow serialized loop and forces pool copies around the
attention custom calls — measured ~45ms/step for a 1B model). The pools
are split (K and V separate arrays — see mem/kv_pool.py for why) and each
token row is stored as a [2, F/2] block: Mosaic rejects single-sublane
bf16 DMAs, but a [2, F/2] unit is one physical sublane-pair and is
tile-legal (same trick as round 1's [2, F] pair rows, relocated inside
the row). Both pools are aliased in/out (in-place; no copy), and the
kernel runs INSIDE the step jit so there is no per-call dispatch cost —
measured fully hidden under the attention gathers at bs=256 on v5e.

Ref behavior: srt/mem_cache/memory_pool.py set_kv_buffer (:1740).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _write_kernel(locs_ref, krows, vrows, k_in, v_in, k_out, v_out, sems, *,
                  page_size: int, num_tokens: int):
    def put(i, slot, rows, out):
        loc = locs_ref[i]
        page = loc // page_size
        off = loc - page * page_size
        return pltpu.make_async_copy(
            rows.at[i], out.at[page, off], sems.at[slot]
        )

    def body(i, _):
        slot = jax.lax.rem(2 * i, NSEM)

        @pl.when(i >= NSEM // 2)
        def _():
            put(i - NSEM // 2, slot, krows, k_out).wait()
            put(i - NSEM // 2, slot + 1, vrows, v_out).wait()

        put(i, slot, krows, k_out).start()
        put(i, slot + 1, vrows, v_out).start()
        return 0

    jax.lax.fori_loop(0, num_tokens, body, 0)

    def drain(i, _):
        slot = jax.lax.rem(2 * i, NSEM)
        put(i, slot, krows, k_out).wait()
        put(i, slot + 1, vrows, v_out).wait()
        return 0

    jax.lax.fori_loop(max(num_tokens - NSEM // 2, 0), num_tokens, drain, 0)


def _write_one_kernel(locs_ref, rows, p_in, p_out, sems, *, page_size: int,
                      num_tokens: int):
    def put(i, slot):
        loc = locs_ref[i]
        page = loc // page_size
        off = loc - page * page_size
        return pltpu.make_async_copy(
            rows.at[i], p_out.at[page, off], sems.at[slot]
        )

    def body(i, _):
        slot = jax.lax.rem(i, NSEM)

        @pl.when(i >= NSEM)
        def _():
            put(i - NSEM, slot).wait()

        put(i, slot).start()
        return 0

    jax.lax.fori_loop(0, num_tokens, body, 0)

    def drain(i, _):
        put(i, jax.lax.rem(i, NSEM)).wait()
        return 0

    jax.lax.fori_loop(max(num_tokens - NSEM, 0), num_tokens, drain, 0)


@functools.partial(jax.jit, static_argnames=("page_size",))
def write_rows_pages(
    pool: jax.Array,  # [NP, ps, 2, FH] (aliased in place)
    rows: jax.Array,  # [T, F] new rows (F = 2*FH)
    locs: jax.Array,  # [T] int32 token slots
    *,
    page_size: int,
) -> jax.Array:
    """Single-pool row scatter (MLA latent pool — mem/kv_pool.py mla_dim).

    3-D pools ([NP, ps, lanes] — int32-packed quantized rows) take rows
    already in storage form [T, lanes]; 4-D pools use the (2, F/2)
    write-legal split."""
    T = rows.shape[0]
    out_shape = pool.shape
    if pool.ndim == 3 and pool.shape[-1] > 128:
        # Wide packed rows span multiple 128-lane tiles; slicing one row
        # of [T, lanes] then cuts the tiled sublane dim to 1 (Mosaic
        # rejects it). View as [..., g, 128] so the per-row slice removes
        # only untiled leading dims — same trick as the bf16 (2, F/2)
        # split below.
        lanes = pool.shape[-1]
        if lanes % 128:  # odd widths: XLA scatter fallback
            pages = locs // page_size
            offs = locs % page_size
            return pool.at[pages, offs].set(rows.astype(pool.dtype))
        g = lanes // 128
        pool = pool.reshape(pool.shape[0], pool.shape[1], g, 128)
        rr = rows.astype(pool.dtype).reshape(T, g, 128)
    elif pool.ndim == 3:
        rr = rows.astype(pool.dtype)
    else:
        fh = pool.shape[-1]
        rr = rows.reshape(T, 2, fh).astype(pool.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    kernel = functools.partial(
        _write_one_kernel, page_size=page_size, num_tokens=T
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(locs, rr, pool)
    return out.reshape(out_shape)


@functools.partial(jax.jit, static_argnames=("page_size",))
def write_kv_pages(
    k_layer: jax.Array,  # [NP, ps, 2, FH] (aliased in place)
    v_layer: jax.Array,  # [NP, ps, 2, FH] (aliased in place)
    krows: jax.Array,  # [T, F] new K rows (F = 2*FH)
    vrows: jax.Array,  # [T, F]
    locs: jax.Array,  # [T] int32 token slots (page*ps + off)
    *,
    page_size: int,
) -> tuple:
    T = krows.shape[0]
    out_shape = k_layer.shape
    if k_layer.ndim == 3 and k_layer.shape[-1] > 128:
        # See write_rows_pages: multi-tile packed rows must be viewed as
        # [..., g, 128] so row slices don't cut a tiled dim.
        lanes = k_layer.shape[-1]
        if lanes % 128:
            pages = locs // page_size
            offs = locs % page_size
            return (
                k_layer.at[pages, offs].set(krows.astype(k_layer.dtype)),
                v_layer.at[pages, offs].set(vrows.astype(v_layer.dtype)),
            )
        g = lanes // 128
        np_, ps_ = k_layer.shape[0], k_layer.shape[1]
        k_layer = k_layer.reshape(np_, ps_, g, 128)
        v_layer = v_layer.reshape(np_, ps_, g, 128)
        kr = krows.astype(k_layer.dtype).reshape(T, g, 128)
        vr = vrows.astype(v_layer.dtype).reshape(T, g, 128)
    elif k_layer.ndim == 3:  # int32-packed quantized pool: rows [T, lanes]
        kr = krows.astype(k_layer.dtype)
        vr = vrows.astype(v_layer.dtype)
    else:
        fh = k_layer.shape[-1]
        kr = krows.reshape(T, 2, fh).astype(k_layer.dtype)
        vr = vrows.reshape(T, 2, fh).astype(v_layer.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    kernel = functools.partial(
        _write_kernel, page_size=page_size, num_tokens=T
    )
    ko, vo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_layer.shape, k_layer.dtype),
            jax.ShapeDtypeStruct(v_layer.shape, v_layer.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(locs, kr, vr, k_layer, v_layer)
    return ko.reshape(out_shape), vo.reshape(out_shape)
