"""Pallas TPU kernels: paged decode attention + ragged paged prefill.

These replace the reference's FlashInfer/FlashAttention CUDA backends
(srt/layers/attention/{flashinfer_backend.py,flashattention_backend.py})
with a TPU-native design:

- KV lives in SPLIT HBM page pools (k, v), each [num_pages, page_size, 2,
  F/2] with F = nk*hd (split-pool rationale + the (2, F/2) write-legal row
  shape: mem/kv_pool.py). Each grid step DMAs exactly the pages a sequence
  needs (dynamic trip count — no padded-page bandwidth waste) through a
  4-slot ring PER POOL so several page fetches are in flight at once:
  decode through this device path is DMA-LATENCY bound, not bandwidth
  bound, and ring depth is what hides it.
- Online (flash) softmax in float32 accumulators; bf16 page traffic.
- GQA: q heads grouped per kv head, addressed with LANE slices of the
  fetched page. A page arrives as [ps, 2, F/2]; head kh's lanes live in
  half (kh*hd)//(F/2) at column (kh*hd)%(F/2) — an integer middle index +
  lane slice, both legal on this Mosaic build (which rejects value
  reshapes and sub-128-lane slices of tiled memrefs). Heads that straddle
  the half boundary (odd nk / tiny F) take a lane-concat fallback.

Layout notes: a K page DMA moves page_size*F*2B contiguous bytes
(64KB at ps=64, nk=8, hd=64); K and V pages ride separate ring slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 4  # DMA ring depth (per pool)


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
    """Paired K+V page DMAs into NBUF-slot rings (2 sems per ring slot)."""

    def start_dma(b, p, slot):
        page = page_table_ref[b, p]
        pltpu.make_async_copy(
            k_pages_hbm.at[page], k_buf.at[slot], sems.at[2 * slot]
        ).start()
        pltpu.make_async_copy(
            v_pages_hbm.at[page], v_buf.at[slot], sems.at[2 * slot + 1]
        ).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            k_pages_hbm.at[0], k_buf.at[slot], sems.at[2 * slot]
        ).wait()
        pltpu.make_async_copy(
            v_pages_hbm.at[0], v_buf.at[slot], sems.at[2 * slot + 1]
        ).wait()

    return start_dma, wait_dma


def _head_slice(buf_page, kh: int, hd: int, fh: int):
    """Head kh's [ps, hd] lanes from a fetched [ps, 2, F/2] page."""
    start = kh * hd
    if start // fh == (start + hd - 1) // fh:
        half = start // fh
        col = start % fh
        return buf_page[:, half, col:col + hd]
    # Straddles the half boundary (odd nk or hd > F/2): lane-concat.
    first = fh - start % fh
    a = buf_page[:, start // fh, start % fh:]
    b = buf_page[:, start // fh + 1, :hd - first]
    return jnp.concatenate([a, b], axis=-1)


def _decode_f8_bytes(b, fmt: str):
    """Unsigned byte values [rows, L] int32 -> EXACT f32 (integer bit
    assembly + bitcast; Mosaic here cannot express f8 loads, so quantized
    pages arrive as int32 lanes and each byte is decoded on the VPU — see
    ops/quant_kv.py for the packing layout)."""
    s = (b >> 7) & 1
    if fmt == "fp8_e5m2":
        e = (b >> 2) & 31
        m = b & 3
        bias, mbits = 15, 2
    else:  # fp8_e4m3 (fn: no inf; e=15&m=7 NaN never produced by quant)
        e = (b >> 3) & 15
        m = b & 7
        bias, mbits = 7, 3
    # Normal numbers: rebase the exponent into the f32 field and shift the
    # mantissa up — the decoded f32 is bit-exact.
    bits = (s << 31) | ((e + (127 - bias)) << 23) | (m << (23 - mbits))
    val = jax.lax.bitcast_convert_type(bits, jnp.float32)
    # Subnormals: m * 2^(1 - bias - mbits), exact as an integer scaled by a
    # power-of-two constant.
    sign = jnp.where(s == 1, -1.0, 1.0)
    subval = sign * m.astype(jnp.float32) * float(2.0 ** (1 - bias - mbits))
    return jnp.where(e > 0, val, subval)


def _head_slice_f8(buf_page, kh: int, hd: int, fmt: str):
    """Head kh's decoded [ps, hd] f32 from a packed [ps, F/4]-int32 page.

    Byte plane j of the head's hd/4 lanes = features [j*hd/4, (j+1)*hd/4)
    (the quant_kv packing layout) so reassembly is a lane concat."""
    L = hd // 4
    x = buf_page[:, kh * L:(kh + 1) * L]  # [ps, L] int32
    planes = [
        _decode_f8_bytes((x >> (8 * j)) & 0xFF, fmt) for j in range(4)
    ]
    return jnp.concatenate(planes, axis=-1)  # [ps, hd] f32


def _run_paged_flash(
    b,
    num_pages,
    start_dma,
    wait_dma,
    k_buf,
    v_buf,
    make_scores,  # fn(k_page [ps, 2, FH] f32, p) -> per-head masked scores
    num_heads_out: int,
    rows: int,
    head_dim: int,
    hd_slice,  # fn(v [ps, 2, FH], h) -> [ps, hd]
):
    """Shared DMA-ring flash-attention loop. Returns (ms, ls, accs) tuples."""

    for i in range(NBUF):
        @pl.when(i < num_pages)
        def _(i=i):
            start_dma(b, i, i)

    def body(p, carry):
        ms, ls, accs = carry
        slot = jax.lax.rem(p, NBUF)
        wait_dma(slot)
        k = k_buf[slot]  # [ps, 2, FH] (raw; make_scores handles dtype)
        v = v_buf[slot]  # [ps, 2, FH]

        scores_per_head = make_scores(k, p)

        @pl.when(p + NBUF < num_pages)
        def _():
            start_dma(b, p + NBUF, slot)

        new_ms, new_ls, new_accs = [], [], []
        for h in range(num_heads_out):
            m2, l2, a2 = _online_update(
                ms[h], ls[h], accs[h], scores_per_head[h], hd_slice(v, h)
            )
            new_ms.append(m2)
            new_ls.append(l2)
            new_accs.append(a2)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    ms0 = tuple(
        jnp.full((rows, 1), NEG_INF, jnp.float32) for _ in range(num_heads_out)
    )
    ls0 = tuple(jnp.zeros((rows, 1), jnp.float32) for _ in range(num_heads_out))
    accs0 = tuple(
        jnp.zeros((rows, head_dim), jnp.float32) for _ in range(num_heads_out)
    )
    return jax.lax.fori_loop(0, num_pages, body, (ms0, ls0, accs0))


def _decode_kernel(
    # scalar prefetch
    page_table_ref,  # [B, P] SMEM
    seq_lens_ref,  # [B] SMEM
    # inputs
    q_ref,  # [1, nq, hd] VMEM block
    k_pages_hbm,  # [NP, ps, 2, FH] ANY (HBM)
    v_pages_hbm,  # [NP, ps, 2, FH] ANY (HBM)
    # outputs
    o_ref,  # [1, nq, hd] VMEM block
    # scratch
    k_buf,  # [NBUF, ps, 2, FH] VMEM
    v_buf,  # [NBUF, ps, 2, FH] VMEM
    sems,  # DMA sems [2*NBUF]
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    window: int = 0,
    logit_cap: float = 0.0,
    kv_quant: str = "",
):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)
    nq = q_ref.shape[1]
    group = nq // num_kv_heads
    hd = head_dim
    fh = k_pages_hbm.shape[-1]

    start_dma, wait_dma = _make_dma_helpers(
        page_table_ref, k_pages_hbm, v_pages_hbm, k_buf, v_buf, sems
    )
    q = q_ref[0].astype(jnp.float32) * scale  # [nq, hd]

    def khead(k, kh):
        if kv_quant:
            return _head_slice_f8(k, kh, hd, kv_quant)
        return _head_slice(k, kh, hd, fh).astype(jnp.float32)

    def make_scores(k, p):
        pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        valid = pos < seq_len  # [1, ps]
        if window > 0:
            valid &= pos >= seq_len - window
        out = []
        for kh in range(num_kv_heads):
            q_kh = q[kh * group : (kh + 1) * group, :]  # [group, hd]
            k_kh = khead(k, kh)  # [ps, hd]
            scores = jax.lax.dot_general(
                q_kh, k_kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if logit_cap > 0:
                scores = jnp.tanh(scores / logit_cap) * logit_cap
            out.append(jnp.where(valid, scores, NEG_INF))
        return out

    def hd_slice(v, kh):
        if kv_quant:
            return _head_slice_f8(v, kh, hd, kv_quant).astype(jnp.bfloat16)
        return _head_slice(v, kh, hd, fh)

    ms, ls, accs = _run_paged_flash(
        b, num_pages, start_dma, wait_dma, k_buf, v_buf, make_scores,
        num_kv_heads, group, hd, hd_slice,
    )
    for kh in range(num_kv_heads):
        out = accs[kh] / jnp.maximum(ls[kh], 1e-20)
        o_ref[0, kh * group : (kh + 1) * group, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_kv_heads", "window",
                     "logit_cap", "kv_quant"),
)
def paged_decode_attention(
    q: jax.Array,  # [B, nq, hd]
    k_pages: jax.Array,  # [NP, ps, 2, FH] (or [NP, ps, F/4] i32 quantized)
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
    window: int = 0,
    logit_cap: float = 0.0,
    kv_quant: str = "",
) -> jax.Array:
    B, nq, hd = q.shape
    if kv_quant:
        _, ps, lanes = k_pages.shape
        assert 4 * lanes == num_kv_heads * hd
        buf_shape = (NBUF, ps, lanes)
    else:
        _, ps, _, fh = k_pages.shape
        assert 2 * fh == num_kv_heads * hd
        buf_shape = (NBUF, ps, 2, fh)
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
            pltpu.VMEM(buf_shape, k_pages.dtype),
            pltpu.VMEM(buf_shape, v_pages.dtype),
            pltpu.SemaphoreType.DMA((2 * NBUF,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        head_dim=hd,
        window=window,
        logit_cap=logit_cap,
        kv_quant=kv_quant,
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
# Ragged prefill (extend): block-mapped q stream against the page pools.
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
    k_pages_hbm,  # [NP, ps, 2, FH]
    v_pages_hbm,  # [NP, ps, 2, FH]
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
    window: int = 0,
    logit_cap: float = 0.0,
    kv_quant: str = "",
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
    fh = k_pages_hbm.shape[-1]
    block_active = q_start < q_len

    # Highest absolute position in this q block (clamped to the seq).
    q_end_abs = prefix + jnp.minimum(q_start + block_q, q_len)
    num_pages = jnp.where(
        block_active, pl.cdiv(jnp.minimum(q_end_abs, seq_len), page_size), 0
    )

    start_dma, wait_dma = _make_dma_helpers(
        page_table_ref, k_pages_hbm, v_pages_hbm, k_buf, v_buf, sems
    )
    q = q_ref[...].astype(jnp.float32) * scale  # [BQ, nq*hd]
    row_pos = (
        prefix
        + q_start
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    )  # [BQ, 1]
    nheads = num_kv_heads * group  # == nq

    def make_scores(k, p):
        ctx_pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )
        causal = ctx_pos <= row_pos  # [BQ, ps]
        if window > 0:
            causal &= ctx_pos > row_pos - window
        out = []
        for h in range(nheads):
            kh = h // group
            q_h = q[:, h * hd : (h + 1) * hd]  # [BQ, hd]
            if kv_quant:
                k_kh = _head_slice_f8(k, kh, hd, kv_quant)
            else:
                k_kh = _head_slice(k, kh, hd, fh).astype(jnp.float32)
            scores = jax.lax.dot_general(
                q_h, k_kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if logit_cap > 0:
                scores = jnp.tanh(scores / logit_cap) * logit_cap
            out.append(jnp.where(causal, scores, NEG_INF))
        return out

    def hd_slice(v, h):
        if kv_quant:
            return _head_slice_f8(v, h // group, hd, kv_quant).astype(
                jnp.bfloat16
            )
        return _head_slice(v, h // group, hd, fh)

    ms, ls, accs = _run_paged_flash(
        b, num_pages, start_dma, wait_dma, k_buf, v_buf, make_scores,
        nheads, block_q, hd, hd_slice,
    )
    for h in range(nheads):
        out = accs[h] / jnp.maximum(ls[h], 1e-20)
        o_ref[:, h * hd : (h + 1) * hd] = out.astype(o_ref.dtype)


# --------------------------------------------------------------------------
# Ragged prefill v2: window-buffered KV + group-folded per-kv-head MXU dots.
#
# Why v1 was slow (8B bench trace, round 5): 25 ms/layer/chunk — per-PAGE
# DMA trips re-fetched every page for every 64-token q block (O(blocks x
# pages) page fetches) and the inner loop issued 32 tiny [64,128]x[128,64]
# dots per page (one per q head), starving the MXU and drowning in per-op
# overhead. v2 restructures:
#   - KV arrives in WINDOWS of up to KVW pages DMA'd into one contiguous
#     VMEM buffer [KVW*ps, 2, FH]; an SMEM signature (seq, window, npages)
#     skips re-fetching pages already resident from the previous grid step
#     (the grid is sequential on TPU, scratch persists) — consecutive q
#     blocks of the same sequence reuse the window.
#   - Scores are ONE 2-D dot per kv head per window: q arrives pre-arranged
#     head-major [nk, T*group, hd] so q_ref[kh] is already the 2-D
#     [BQ*group, hd] MXU operand, and the window buffer's head slice
#     [KVW*ps, hd] is 2-D by construction (no value reshapes, which this
#     Mosaic build rejects).
# bf16 pools only; quantized pools stay on v1 (packed int32 rows).
# --------------------------------------------------------------------------

KVW = 8  # pages per KV window (VMEM: 2 pools * KVW * ps * F bytes)


def _extend_kernel_v2(
    # scalar prefetch
    page_table_ref,  # [B, P]
    seq_lens_ref,  # [B]
    prefix_lens_ref,  # [B]
    q_lens_ref,  # [B]
    block_seq_ref,  # [NB]
    block_q_off_ref,  # [NB]
    # inputs
    q_ref,  # [nk, BQ*group, hd] VMEM block (head-major fold)
    k_pages_hbm,  # [NP, ps, 2, FH] ANY
    v_pages_hbm,
    # outputs
    o_ref,  # [nk, BQ*group, hd]
    # scratch
    k_win,  # [KVW*ps, 2, FH] VMEM
    v_win,
    sems,  # [2*KVW] DMA sems
    loaded,  # SMEM [4]: seq, window, npages_loaded, <pad>
    *,
    scale: float,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    block_q: int,
    group: int,
    window: int = 0,
    logit_cap: float = 0.0,
):
    i = pl.program_id(0)
    b = block_seq_ref[i]
    q_start = block_q_off_ref[i]
    prefix = prefix_lens_ref[b]
    q_len = q_lens_ref[b]
    seq_len = seq_lens_ref[b]
    ps = page_size
    hd = head_dim
    nk = num_kv_heads
    fh = k_pages_hbm.shape[-1]
    rows = block_q * group
    block_active = q_start < q_len

    @pl.when(i == 0)
    def _():
        loaded[0] = -1
        loaded[1] = -1
        loaded[2] = 0
        # Zero the window buffers: rows beyond a window's fetched pages are
        # read (then masked) by the full-window dots — the masked
        # probability is 0, but 0 * uninitialized would still poison the
        # accumulator if the stale memory held a NaN.
        k_win[...] = jnp.zeros_like(k_win)
        v_win[...] = jnp.zeros_like(v_win)

    # Pages this block attends: 0 .. ceil(min(prefix + q_end, seq)/ps).
    q_end_abs = prefix + jnp.minimum(q_start + block_q, q_len)
    num_pages = jnp.where(
        block_active, pl.cdiv(jnp.minimum(q_end_abs, seq_len), ps), 0
    )
    num_wins = pl.cdiv(num_pages, KVW)
    # Sliding-window attention never looks before this window index.
    w_lo = (
        jnp.maximum(prefix + q_start + 1 - window, 0) // (KVW * ps)
        if window > 0 else 0
    )

    # q stays in its storage dtype: the MXU takes bf16 operands with f32
    # accumulation for free, and f32 copies of q/k here blow the VMEM
    # budget at 8B shapes. Scale is applied to the f32 scores.
    q = q_ref[...]  # [nk, rows, hd]
    # Absolute position of each folded row's token: row r -> token r//group.
    row_pos = (
        prefix + q_start
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // group
    )

    def run_window(w, carry):
        ms, ls, accs = carry
        win_pages = jnp.minimum(num_pages - w * KVW, KVW)

        # Fetch the window's pages, skipping any already resident.
        same = (loaded[0] == b) & (loaded[1] == w)
        start_pg = jnp.where(same, loaded[2], 0)

        def issue(j, _):
            @pl.when((j >= start_pg) & (j < win_pages))
            def _():
                page = page_table_ref[b, w * KVW + j]
                pltpu.make_async_copy(
                    k_pages_hbm.at[page],
                    k_win.at[pl.ds(j * ps, ps)],
                    sems.at[2 * j],
                ).start()
                pltpu.make_async_copy(
                    v_pages_hbm.at[page],
                    v_win.at[pl.ds(j * ps, ps)],
                    sems.at[2 * j + 1],
                ).start()
            return 0

        jax.lax.fori_loop(0, KVW, issue, 0)

        def wait(j, _):
            @pl.when((j >= start_pg) & (j < win_pages))
            def _():
                pltpu.make_async_copy(
                    k_pages_hbm.at[0], k_win.at[pl.ds(j * ps, ps)],
                    sems.at[2 * j],
                ).wait()
                pltpu.make_async_copy(
                    v_pages_hbm.at[0], v_win.at[pl.ds(j * ps, ps)],
                    sems.at[2 * j + 1],
                ).wait()
            return 0

        jax.lax.fori_loop(0, KVW, wait, 0)
        loaded[0] = b
        loaded[1] = w
        loaded[2] = jnp.maximum(win_pages, jnp.where(same, loaded[2], 0))

        N = KVW * ps
        ctx_pos = w * N + jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        valid = (ctx_pos <= row_pos) & (
            ctx_pos < jnp.minimum(seq_len, (w * KVW + win_pages) * ps)
        )
        if window > 0:
            valid &= ctx_pos > row_pos - window

        new_ms, new_ls, new_accs = [], [], []
        for kh in range(nk):
            start = kh * hd
            half, col = start // fh, start % fh
            k_kh = k_win[:, half, col:col + hd]  # [N, hd] storage dtype
            q_kh = q[kh]  # [rows, hd]
            scores = jax.lax.dot_general(
                q_kh, k_kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [rows, N]
            if logit_cap > 0:
                scores = jnp.tanh(scores / logit_cap) * logit_cap
            scores = jnp.where(valid, scores, NEG_INF)
            v_kh = v_win[:, half, col:col + hd]  # [N, hd] bf16
            m2, l2, a2 = _online_update(
                ms[kh], ls[kh], accs[kh], scores, v_kh
            )
            new_ms.append(m2)
            new_ls.append(l2)
            new_accs.append(a2)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    ms0 = tuple(jnp.full((rows, 1), NEG_INF, jnp.float32) for _ in range(nk))
    ls0 = tuple(jnp.zeros((rows, 1), jnp.float32) for _ in range(nk))
    accs0 = tuple(jnp.zeros((rows, hd), jnp.float32) for _ in range(nk))
    ms, ls, accs = jax.lax.fori_loop(
        w_lo, num_wins, run_window, (ms0, ls0, accs0)
    )
    for kh in range(nk):
        out = accs[kh] / jnp.maximum(ls[kh], 1e-20)
        o_ref[kh] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "block_q", "num_kv_heads",
                     "window", "logit_cap"),
)
def paged_extend_attention_v2(
    q: jax.Array,  # [T, nq, hd] (T multiple of block_q; aligned segments)
    k_pages: jax.Array,  # [NP, ps, 2, FH] bf16
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
    window: int = 0,
    logit_cap: float = 0.0,
) -> jax.Array:
    T, nq, hd = q.shape
    _, ps, _, fh = k_pages.shape
    assert 2 * fh == num_kv_heads * hd and T % block_q == 0
    nk = num_kv_heads
    group = nq // nk
    # Head-major fold: [T, nk, group, hd] -> [nk, T*group, hd] so the
    # kernel's per-head operand is a contiguous 2-D block.
    qh = q.reshape(T, nk, group, hd).transpose(1, 0, 2, 3).reshape(
        nk, T * group, hd
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T // block_q,),
        in_specs=[
            pl.BlockSpec(
                (nk, block_q * group, hd),
                lambda i, *_: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nk, block_q * group, hd),
            lambda i, *_: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((KVW * ps, 2, fh), k_pages.dtype),
            pltpu.VMEM((KVW * ps, 2, fh), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2 * KVW,)),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _extend_kernel_v2,
        scale=scale,
        page_size=page_size,
        num_kv_heads=nk,
        head_dim=hd,
        block_q=block_q,
        group=group,
        window=window,
        logit_cap=logit_cap,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
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
        qh,
        k_pages,
        v_pages,
    )
    # [nk, T*group, hd] -> [T, nq, hd]
    return out.reshape(nk, T, group, hd).transpose(1, 0, 2, 3).reshape(
        T, nq, hd
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "block_q", "num_kv_heads",
                     "window", "logit_cap", "kv_quant"),
)
def paged_extend_attention(
    q: jax.Array,  # [T, nq*hd] folded (T multiple of block_q; aligned segs)
    k_pages: jax.Array,  # [NP, ps, 2, FH] (or [NP, ps, F/4] i32 quantized)
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
    window: int = 0,
    logit_cap: float = 0.0,
    kv_quant: str = "",
) -> jax.Array:
    T, Fq = q.shape
    if kv_quant:
        _, ps, lanes = k_pages.shape
        F = 4 * lanes
        buf_shape = (NBUF, ps, lanes)
    else:
        _, ps, _, fh = k_pages.shape
        F = 2 * fh
        buf_shape = (NBUF, ps, 2, fh)
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
            pltpu.VMEM(buf_shape, k_pages.dtype),
            pltpu.VMEM(buf_shape, v_pages.dtype),
            pltpu.SemaphoreType.DMA((2 * NBUF,)),
        ],
    )
    kernel = functools.partial(
        _extend_kernel,
        scale=scale,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        head_dim=hd,
        block_q=block_q,
        window=window,
        logit_cap=logit_cap,
        kv_quant=kv_quant,
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
