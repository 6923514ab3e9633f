"""Pallas TPU kernels: paged decode attention + ragged paged prefill.

These replace the reference's FlashInfer/FlashAttention CUDA backends
(srt/layers/attention/{flashinfer_backend.py,flashattention_backend.py})
with a TPU-native design:

- KV lives in an HBM page pool folded as [num_pages, page_size, nk*hd];
  each grid step DMAs exactly the pages a sequence needs (dynamic trip
  count — no padded-page bandwidth waste), double-buffered so the DMA
  engine stays ahead of the VPU/MXU. Decode is HBM-bandwidth-bound; this
  is the speed-of-light shape for it.
- Online (flash) softmax in float32 accumulators; bf16 page traffic.
- GQA: q heads grouped per kv head. Heads are addressed with LANE slices
  of the folded page (k[:, kh*hd:(kh+1)*hd]) — no reshapes/transposes of
  DMA'd data (this Mosaic build rejects value reshapes and sub-128 slices
  of tiled memrefs; lane slices and integer middle-index reads are fine).

Layout notes: a page DMA moves page_size*nk*hd*2B contiguous bytes
(64KB at ps=64, nk=8, hd=64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    """Interpreter mode off-TPU so CPU CI exercises the same kernels."""
    return jax.default_backend() != "tpu"


def _online_update(m, l, acc, scores, v_slice):
    """One flash-softmax step: m,l [rows,1] f32; acc [rows,hd] f32;
    scores [rows, ps] f32 (masked); v_slice [ps, hd]."""
    m_cur = jnp.max(scores, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    corr = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * corr + jax.lax.dot(
        p.astype(v_slice.dtype), v_slice, preferred_element_type=jnp.float32
    )
    return m_new, l_new, acc_new


def _make_dma_helpers(page_table_ref, k_pages_hbm, v_pages_hbm, k_buf, v_buf,
                      sems):
    def start_dma(b, p, slot):
        page = page_table_ref[b, p]
        pltpu.make_async_copy(
            k_pages_hbm.at[page], k_buf.at[slot], sems.at[0, slot]
        ).start()
        pltpu.make_async_copy(
            v_pages_hbm.at[page], v_buf.at[slot], sems.at[1, slot]
        ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            k_pages_hbm.at[0], k_buf.at[slot], sems.at[0, slot]
        ).wait()
        pltpu.make_async_copy(
            v_pages_hbm.at[0], v_buf.at[slot], sems.at[1, slot]
        ).wait()

    return start_dma, wait_dma


def _decode_kernel(
    # scalar prefetch
    page_table_ref,  # [B, P] SMEM
    seq_lens_ref,  # [B] SMEM
    # inputs
    q_ref,  # [1, nq, hd] VMEM block
    k_pages_hbm,  # [NP, ps, nk*hd] ANY (HBM)
    v_pages_hbm,
    # outputs
    o_ref,  # [1, nq, hd] VMEM block
    # scratch
    k_buf,  # [2, ps, nk*hd] VMEM
    v_buf,
    sems,  # DMA sems [2, 2]
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)
    nq = q_ref.shape[1]
    group = nq // num_kv_heads
    hd = head_dim

    start_dma, wait_dma = _make_dma_helpers(
        page_table_ref, k_pages_hbm, v_pages_hbm, k_buf, v_buf, sems
    )

    @pl.when(num_pages > 0)  # padded rows have seq_len 0: no DMA to leak
    def _():
        start_dma(b, 0, 0)

    q = q_ref[0].astype(jnp.float32) * scale  # [nq, hd]

    def body(p, carry):
        ms, ls, accs = carry  # tuples of per-kv-head arrays
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < num_pages)
        def _():
            start_dma(b, p + 1, 1 - slot)

        wait_dma(slot)
        k = k_buf[slot].astype(jnp.float32)  # [ps, nk*hd]
        v = v_buf[slot]  # [ps, nk*hd] bf16

        pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        valid = pos < seq_len  # [1, ps]

        new_ms, new_ls, new_accs = [], [], []
        for kh in range(num_kv_heads):
            q_kh = q[kh * group : (kh + 1) * group, :]  # [group, hd]
            k_kh = k[:, kh * hd : (kh + 1) * hd]  # [ps, hd]
            scores = jax.lax.dot_general(
                q_kh,
                k_kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [group, ps]
            scores = jnp.where(valid, scores, NEG_INF)
            m2, l2, a2 = _online_update(
                ms[kh], ls[kh], accs[kh], scores,
                v[:, kh * hd : (kh + 1) * hd],
            )
            new_ms.append(m2)
            new_ls.append(l2)
            new_accs.append(a2)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    ms0 = tuple(
        jnp.full((group, 1), NEG_INF, jnp.float32) for _ in range(num_kv_heads)
    )
    ls0 = tuple(jnp.zeros((group, 1), jnp.float32) for _ in range(num_kv_heads))
    accs0 = tuple(
        jnp.zeros((group, hd), jnp.float32) for _ in range(num_kv_heads)
    )
    ms, ls, accs = jax.lax.fori_loop(0, num_pages, body, (ms0, ls0, accs0))
    for kh in range(num_kv_heads):
        out = accs[kh] / jnp.maximum(ls[kh], 1e-20)
        o_ref[0, kh * group : (kh + 1) * group, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "page_size", "num_kv_heads")
)
def paged_decode_attention(
    q: jax.Array,  # [B, nq, hd]
    k_pages: jax.Array,  # [NP, ps, nk*hd]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
) -> jax.Array:
    B, nq, hd = q.shape
    _, ps, F = k_pages.shape
    assert F == num_kv_heads * hd
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, nq, hd), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, nq, hd), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ps, F), k_pages.dtype),
            pltpu.VMEM((2, ps, F), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        head_dim=hd,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(page_table, seq_lens, q, k_pages, v_pages)


# --------------------------------------------------------------------------
# Ragged prefill (extend): block-mapped q stream against the page pool.
# The token stream is laid out with each sequence's segment aligned to the
# q-block size (EXTEND_ALIGN in batch_builder), so every q block belongs to
# exactly one sequence — block_seq/block_q_off (scalar-prefetched) give the
# mapping, and there is no dense gather/scatter around the kernel.
# --------------------------------------------------------------------------


def _extend_kernel(
    # scalar prefetch
    page_table_ref,  # [B, P]
    seq_lens_ref,  # [B] total ctx (incl. new tokens)
    prefix_lens_ref,  # [B] tokens already in KV before this step's q
    q_lens_ref,  # [B] new tokens this step
    block_seq_ref,  # [NB] owning seq per q block
    block_q_off_ref,  # [NB] block's first-token offset within its seq
    # inputs
    q_ref,  # [BQ, nq*hd] VMEM block (heads folded into lanes)
    k_pages_hbm,  # [NP, ps, nk*hd]
    v_pages_hbm,
    # outputs
    o_ref,  # [BQ, nq*hd]
    # scratch
    k_buf,
    v_buf,
    sems,
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    block_q: int,
):
    i = pl.program_id(0)
    b = block_seq_ref[i]
    q_start = block_q_off_ref[i]
    prefix = prefix_lens_ref[b]
    q_len = q_lens_ref[b]
    seq_len = seq_lens_ref[b]
    hd = head_dim
    nq = q_ref.shape[1] // hd
    group = nq // num_kv_heads
    block_active = q_start < q_len

    # Highest absolute position in this q block (clamped to the seq).
    q_end_abs = prefix + jnp.minimum(q_start + block_q, q_len)
    num_pages = jnp.where(
        block_active, pl.cdiv(jnp.minimum(q_end_abs, seq_len), page_size), 0
    )

    start_dma, wait_dma = _make_dma_helpers(
        page_table_ref, k_pages_hbm, v_pages_hbm, k_buf, v_buf, sems
    )

    @pl.when(block_active)
    def _():
        start_dma(b, 0, 0)

    q = q_ref[...].astype(jnp.float32) * scale  # [BQ, nq*hd]
    row_pos = (
        prefix
        + q_start
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    )  # [BQ, 1]

    nheads = num_kv_heads * group  # == nq

    def body(p, carry):
        ms, ls, accs = carry  # per-q-head tuples: [BQ,1],[BQ,1],[BQ,hd]
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < num_pages)
        def _():
            start_dma(b, p + 1, 1 - slot)

        wait_dma(slot)
        k = k_buf[slot].astype(jnp.float32)  # [ps, nk*hd]
        v = v_buf[slot]

        ctx_pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        causal = ctx_pos <= row_pos  # [BQ, ps]

        new_ms, new_ls, new_accs = [], [], []
        for h in range(nheads):
            kh = h // group
            q_h = q[:, h * hd : (h + 1) * hd]  # [BQ, hd]
            k_kh = k[:, kh * hd : (kh + 1) * hd]  # [ps, hd]
            scores = jax.lax.dot_general(
                q_h,
                k_kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ, ps]
            scores = jnp.where(causal, scores, NEG_INF)
            m2, l2, a2 = _online_update(
                ms[h], ls[h], accs[h], scores,
                v[:, kh * hd : (kh + 1) * hd],
            )
            new_ms.append(m2)
            new_ls.append(l2)
            new_accs.append(a2)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    ms0 = tuple(
        jnp.full((block_q, 1), NEG_INF, jnp.float32) for _ in range(nheads)
    )
    ls0 = tuple(jnp.zeros((block_q, 1), jnp.float32) for _ in range(nheads))
    accs0 = tuple(
        jnp.zeros((block_q, hd), jnp.float32) for _ in range(nheads)
    )
    ms, ls, accs = jax.lax.fori_loop(0, num_pages, body, (ms0, ls0, accs0))
    for h in range(nheads):
        out = accs[h] / jnp.maximum(ls[h], 1e-20)
        o_ref[:, h * hd : (h + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "block_q", "num_kv_heads"),
)
def paged_extend_attention(
    q: jax.Array,  # [T, nq*hd] folded (T multiple of block_q; aligned segments)
    k_pages: jax.Array,  # [NP, ps, nk*hd]
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, P]
    seq_lens: jax.Array,  # [B]
    prefix_lens: jax.Array,  # [B]
    q_lens: jax.Array,  # [B]
    block_seq: jax.Array,  # [T/block_q]
    block_q_off: jax.Array,  # [T/block_q]
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
    block_q: int = 64,
) -> jax.Array:
    T, Fq = q.shape
    _, ps, F = k_pages.shape
    hd = F // num_kv_heads
    assert T % block_q == 0 and Fq % hd == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T // block_q,),
        in_specs=[
            pl.BlockSpec(
                (block_q, Fq),
                lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_q, Fq),
            lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ps, F), k_pages.dtype),
            pltpu.VMEM((2, ps, F), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _extend_kernel,
        scale=scale,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        head_dim=hd,
        block_q=block_q,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        page_table,
        seq_lens,
        prefix_lens,
        q_lens,
        block_seq,
        block_q_off,
        q,
        k_pages,
        v_pages,
    )
