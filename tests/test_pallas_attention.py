"""Pallas paged-attention kernels vs reference math.

Runs in interpreter mode on CPU (same kernels compile on TPU).
Reference: plain masked softmax attention over gathered pages (the
xla_native backend math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def ref_attention(q, k_ctx, v_ctx, scale, mask):
    """q: [rows, nq, hd]; k_ctx/v_ctx: [rows, C, nk, hd]; mask: [rows, C]."""
    rows, nq, hd = q.shape
    nk = k_ctx.shape[2]
    group = nq // nk
    qf = q.astype(np.float32).reshape(rows, nk, group, hd)
    kf = k_ctx.astype(np.float32)
    scores = np.einsum("rkgd,rckd->rkgc", qf, kf) * scale
    scores = np.where(mask[:, None, None, :], scores, -1e30)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    out = np.einsum("rkgc,rckd->rkgd", p, v_ctx.astype(np.float32))
    return out.reshape(rows, nq, hd)


def make_pool(rng, num_pages, ps, nk, hd, dtype=np.float32):
    k = rng.standard_normal((num_pages, ps, nk, hd)).astype(dtype)
    v = rng.standard_normal((num_pages, ps, nk, hd)).astype(dtype)
    return k, v


def test_decode_kernel_matches_reference():
    from sglang_tpu.ops.attention.pallas_kernels import paged_decode_attention

    rng = np.random.default_rng(0)
    B, nq, nk, hd, ps, P = 4, 8, 2, 64, 16, 8
    NP = 64
    k_pages, v_pages = make_pool(rng, NP, ps, nk, hd)
    q = rng.standard_normal((B, nq, hd)).astype(np.float32)
    seq_lens = np.array([5, 16, 33, 128 - 7], np.int32)
    page_table = np.zeros((B, P), np.int32)
    next_page = 1
    for b in range(B):
        n = -(-int(seq_lens[b]) // ps)
        page_table[b, :n] = np.arange(next_page, next_page + n)
        next_page += n
    scale = hd**-0.5

    out = np.asarray(
        paged_decode_attention(
            jnp.asarray(q),
            jnp.asarray(k_pages.reshape(NP, ps, 2, nk * hd // 2)),
            jnp.asarray(v_pages.reshape(NP, ps, 2, nk * hd // 2)),
            jnp.asarray(page_table),
            jnp.asarray(seq_lens),
            scale=scale,
            page_size=ps,
            num_kv_heads=nk,
        )
    )

    # reference
    C = P * ps
    k_ctx = k_pages[page_table].reshape(B, C, nk, hd)
    v_ctx = v_pages[page_table].reshape(B, C, nk, hd)
    mask = np.arange(C)[None, :] < seq_lens[:, None]
    ref = ref_attention(q, k_ctx, v_ctx, scale, mask)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_extend_kernel_matches_reference():
    from sglang_tpu.ops.attention.pallas_kernels import paged_extend_attention

    rng = np.random.default_rng(1)
    nq, nk, hd, ps, P = 8, 2, 64, 16, 16
    BQ = 64
    NP = 128
    B = 3
    prefix_lens = np.array([0, 32, 70], np.int32)
    q_lens = np.array([50, 64, 130], np.int32)
    seq_lens = prefix_lens + q_lens
    k_pages, v_pages = make_pool(rng, NP, ps, nk, hd)
    page_table = np.zeros((B, P), np.int32)
    next_page = 1
    for b in range(B):
        n = -(-int(seq_lens[b]) // ps)
        page_table[b, :n] = np.arange(next_page, next_page + n)
        next_page += n

    # aligned token stream
    seg_off, off = [], 0
    for b in range(B):
        seg_off.append(off)
        off += -(-int(q_lens[b]) // BQ) * BQ
    T = off
    NB = T // BQ
    q = rng.standard_normal((T, nq, hd)).astype(np.float32)
    block_seq = np.zeros(NB, np.int32)
    block_q_off = np.zeros(NB, np.int32)
    for b in range(B):
        nb = -(-int(q_lens[b]) // BQ)
        b0 = seg_off[b] // BQ
        block_seq[b0 : b0 + nb] = b
        block_q_off[b0 : b0 + nb] = np.arange(nb) * BQ

    scale = hd**-0.5
    out = np.asarray(
        paged_extend_attention(
            jnp.asarray(q.reshape(T, nq * hd)),
            jnp.asarray(k_pages.reshape(NP, ps, 2, nk * hd // 2)),
            jnp.asarray(v_pages.reshape(NP, ps, 2, nk * hd // 2)),
            jnp.asarray(page_table),
            jnp.asarray(seq_lens),
            jnp.asarray(prefix_lens),
            jnp.asarray(q_lens),
            jnp.asarray(block_seq),
            jnp.asarray(block_q_off),
            scale=scale,
            page_size=ps,
            num_kv_heads=nk,
            block_q=BQ,
        )
    ).reshape(T, nq, hd)

    C = P * ps
    ctx_pos = np.arange(C)
    for b in range(B):
        k_ctx = k_pages[page_table[b]].reshape(C, nk, hd)
        v_ctx = v_pages[page_table[b]].reshape(C, nk, hd)
        ql = int(q_lens[b])
        qs = q[seg_off[b] : seg_off[b] + ql]
        row_pos = prefix_lens[b] + np.arange(ql)
        mask = ctx_pos[None, :] <= row_pos[:, None]
        ref = ref_attention(
            qs, np.broadcast_to(k_ctx, (ql, C, nk, hd)),
            np.broadcast_to(v_ctx, (ql, C, nk, hd)), scale, mask
        )
        np.testing.assert_allclose(
            out[seg_off[b] : seg_off[b] + ql], ref, rtol=2e-5, atol=2e-5,
            err_msg=f"seq {b}",
        )


@pytest.mark.parametrize("window", [0, 48])
def test_extend_kernel_v2_matches_reference(window):
    """v2 (window-buffered KV + head-major folded dots) vs reference math,
    including sequences spanning multiple KV windows (seq > KVW*ps) and
    sliding-window attention."""
    from sglang_tpu.ops.attention.pallas_kernels import (
        KVW,
        paged_extend_attention_v2,
    )

    rng = np.random.default_rng(2)
    nq, nk, hd, ps = 8, 2, 64, 16
    BQ = 64
    B = 3
    prefix_lens = np.array([0, 32, 170], np.int32)
    q_lens = np.array([50, 64, 130], np.int32)
    seq_lens = prefix_lens + q_lens  # seq 2 = 300 > KVW*ps = 256
    assert int(seq_lens.max()) > KVW * ps
    P = 32
    NP = 128
    k_pages, v_pages = make_pool(rng, NP, ps, nk, hd)
    page_table = np.zeros((B, P), np.int32)
    next_page = 1
    for b in range(B):
        n = -(-int(seq_lens[b]) // ps)
        page_table[b, :n] = np.arange(next_page, next_page + n)
        next_page += n

    seg_off, off = [], 0
    for b in range(B):
        seg_off.append(off)
        off += -(-int(q_lens[b]) // BQ) * BQ
    T = off
    NB = T // BQ
    q = rng.standard_normal((T, nq, hd)).astype(np.float32)
    block_seq = np.zeros(NB, np.int32)
    block_q_off = np.zeros(NB, np.int32)
    for b in range(B):
        nb = -(-int(q_lens[b]) // BQ)
        b0 = seg_off[b] // BQ
        block_seq[b0 : b0 + nb] = b
        block_q_off[b0 : b0 + nb] = np.arange(nb) * BQ

    scale = hd**-0.5
    out = np.asarray(
        paged_extend_attention_v2(
            jnp.asarray(q),
            jnp.asarray(k_pages.reshape(NP, ps, 2, nk * hd // 2)),
            jnp.asarray(v_pages.reshape(NP, ps, 2, nk * hd // 2)),
            jnp.asarray(page_table),
            jnp.asarray(seq_lens),
            jnp.asarray(prefix_lens),
            jnp.asarray(q_lens),
            jnp.asarray(block_seq),
            jnp.asarray(block_q_off),
            scale=scale,
            page_size=ps,
            num_kv_heads=nk,
            block_q=BQ,
            window=window,
        )
    )

    C = P * ps
    ctx_pos = np.arange(C)
    for b in range(B):
        k_ctx = k_pages[page_table[b]].reshape(C, nk, hd)
        v_ctx = v_pages[page_table[b]].reshape(C, nk, hd)
        ql = int(q_lens[b])
        qs = q[seg_off[b] : seg_off[b] + ql]
        row_pos = prefix_lens[b] + np.arange(ql)
        mask = ctx_pos[None, :] <= row_pos[:, None]
        mask &= ctx_pos[None, :] < int(seq_lens[b])
        if window:
            mask &= ctx_pos[None, :] > row_pos[:, None] - window
        ref = ref_attention(
            qs, np.broadcast_to(k_ctx, (ql, C, nk, hd)),
            np.broadcast_to(v_ctx, (ql, C, nk, hd)), scale, mask
        )
        np.testing.assert_allclose(
            out[seg_off[b] : seg_off[b] + ql], ref, rtol=2e-5, atol=2e-5,
            err_msg=f"seq {b} window={window}",
        )
