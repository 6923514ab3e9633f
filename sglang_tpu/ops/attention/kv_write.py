"""Pallas KV-write kernel: scatter new tokens' K/V rows into the page pool.

Replaces the XLA scatter (which on this TPU toolchain lowers to a
catastrophically slow serialized loop and forces pool copies around the
attention custom calls — measured ~45ms/step for a 1B model). Each token's
K and V are adjacent sublanes in the pair-layout pool [NP, ps, 2, nk*hd],
so one [2, F] DMA per token is tile-legal (bf16 needs sublane pairs). The
pool is aliased in/out (in-place; no copy), and the kernel runs INSIDE the
step jit so there is no per-call dispatch cost.
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


def _write_kernel(locs_ref, rows_ref, kv_in, kv_out, sems, *, page_size: int,
                  num_tokens: int):
    def put(i, slot):
        loc = locs_ref[i]
        page = loc // page_size
        off = loc - page * page_size
        return pltpu.make_async_copy(
            rows_ref.at[i], kv_out.at[page, off], sems.at[slot]
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
def write_kv_pages(
    kv_layer: jax.Array,  # [NP, ps, 2, F] (aliased in place)
    rows: jax.Array,  # [T, 2, F] stacked (k, v) per token
    locs: jax.Array,  # [T] int32 token slots (page*ps + off)
    *,
    page_size: int,
) -> jax.Array:
    T = rows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    kernel = functools.partial(
        _write_kernel, page_size=page_size, num_tokens=T
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_layer.shape, kv_layer.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(locs, rows, kv_layer)
